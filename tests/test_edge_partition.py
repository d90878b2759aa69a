"""Edge-partitioned execution (parallel/ep.py): forward values, both force
paths, and training gradients must match the single-device model exactly
(vma-tracked shard_map)."""

import numpy as np
import pytest


def _setup(triplets_only=False):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import random_molecule, _toy_energy_forces
    from gemnet_pytorch_tpu.models import make_model

    cfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=2, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=8, emb_size_rbf=8,
        emb_size_cbf=8, emb_size_sbf=8, emb_size_bil_quad=8, emb_size_bil_trip=8,
        triplets_only=triplets_only, direct_forces=True,
    )
    rng = np.random.default_rng(0)
    mols = [random_molecule(rng, int(rng.integers(6, 10))) for _ in range(4)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E = np.array([e for e, _ in EF], np.float32)
    F = np.concatenate([f for _, f in EF])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=triplets_only)
    dims = PadDims(
        n_mol=4, n_atoms=48, n_edges=512, n_triplets=2048, kmax3=16,
        n_int_edges=0 if triplets_only else 512,
        n_intm=0 if triplets_only else 2048,
        n_quads=0 if triplets_only else 8192,
        kmax4=0 if triplets_only else 64,
    ).grow_to(_scale_graph_dims(g, 1.1), 4, len(Z))
    batch = pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=triplets_only)
    model = make_model(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jbatch))
    return model, variables, batch, jbatch


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("triplets_only", [False, True])
def test_ep_forward_matches_single_device(n_shards, triplets_only):
    # direct-force model: E and F both edge-level exact under the psum
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.ep import (
        make_ep_apply, partition_batch, shard_ep_batch,
    )

    model, variables, batch, jbatch = _setup(triplets_only)
    E_ref, F_ref, _ = energy_and_forces(model, variables, jbatch)

    mesh = make_mesh(n_shards, axis_names=("ep",))
    part = partition_batch(batch, n_shards)
    sharded = shard_ep_batch(part, mesh)
    apply_fn = make_ep_apply(model, mesh)
    E, F = apply_fn(variables, sharded)
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_ref), rtol=1e-5, atol=1e-5)
    # direct-force head is edge-level (replicated after the bilinear psum), so
    # forces are exact too; the -dE/dR path under partitioning needs
    # vma-tracked outer differentiation (PARALLEL.md, round 2)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref), rtol=1e-4, atol=1e-5)


def test_ep_autograd_forces_match_single_device():
    """-dE/dR forces through the partitioned model (inner jax.grad under the
    vma-tracked shard_map) == single-device forces."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.ep import (
        make_ep_apply, partition_batch, shard_ep_batch,
    )

    model, variables, batch, jbatch = _setup(triplets_only=False)
    model = make_model(dataclasses.replace(model.config, direct_forces=False))
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jbatch))
    E_ref, F_ref, _ = energy_and_forces(model, variables, jbatch)

    mesh = make_mesh(2, axis_names=("ep",))
    part = partition_batch(batch, 2)
    sharded = shard_ep_batch(part, mesh)
    apply_fn = make_ep_apply(model, mesh)
    E, F = apply_fn(variables, sharded)
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref), rtol=1e-4, atol=1e-5)


def test_ep_training_grads_match_single_device():
    """Loss gradients (params) through the ep model == single-device grads
    (jax.grad outside the vma-tracked shard_map)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.ep import (
        make_ep_loss_and_grad, partition_batch, shard_ep_batch,
    )

    model, variables, batch, jbatch = _setup(triplets_only=False)
    params = variables["params"]
    scales = variables.get("scale_factors", {})

    def loss_single(params):
        E, F, _ = energy_and_forces(
            model, {"params": params, "scale_factors": scales}, jbatch
        )
        m = jbatch["mol_mask"].astype(jnp.float32)[:, None]
        am = jbatch["atom_mask"].astype(jnp.float32)[:, None]
        return (
            jnp.sum(jnp.abs(E - jbatch["E"]) * m)
            + jnp.sum(jnp.abs(F[:, 0, :] - jbatch["F"]) * am)
        )

    g_ref = jax.grad(loss_single)(params)

    n_shards = 2
    mesh = make_mesh(n_shards, axis_names=("ep",))
    part = partition_batch(batch, n_shards)
    sharded = shard_ep_batch(part, mesh)

    def loss_fn(E, F, local):
        m = local["mol_mask"].astype(jnp.float32)[:, None]
        am = local["atom_mask"].astype(jnp.float32)[:, None]
        return (
            jnp.sum(jnp.abs(E - local["E"]) * m)
            + jnp.sum(jnp.abs(F[:, 0, :] - local["F"]) * am)
        )

    lg = make_ep_loss_and_grad(model, mesh, loss_fn)
    _, g_vars = lg({"params": params, "scale_factors": scales}, sharded)
    g_ep = g_vars["params"]

    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_ep = jax.tree_util.tree_leaves(g_ep)
    bad = []
    for (path, a), b in zip(flat_ref, flat_ep):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        tol = 1e-4 + 1e-3 * np.abs(a).max()
        if err > tol:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            bad.append((name, float(err), float(np.abs(a).max())))
    assert not bad, bad[:10]


def test_ep_train_step_runs_and_converges():
    """Full ep training step (optimizer+EMA+metrics) reduces the loss."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.ep import (
        make_ep_train_step, partition_batch, shard_ep_batch,
    )
    from gemnet_pytorch_tpu.training import Trainer

    model, variables, batch, jbatch = _setup(triplets_only=False)
    trainer = Trainer(model, TrainConfig(weight_decay=1e-6, loss="mae",
                                         rho_force=0.5, learning_rate=3e-3))
    state = trainer.init_state(variables)
    mesh = make_mesh(2, axis_names=("ep",))
    sharded = shard_ep_batch(partition_batch(batch, 2), mesh)
    step = make_ep_train_step(trainer, mesh)
    losses = []
    for _ in range(12):
        state, metrics = step(state, sharded, jnp.asarray(1.0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
