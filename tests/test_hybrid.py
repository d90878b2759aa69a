"""dp x ep composed mesh: global loss and gradients must equal the
single-device computation over the union of the dp shards."""

import numpy as np
import pytest


def _shard(seed, cfg, dims):
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule

    rng = np.random.default_rng(seed)
    mols = [random_molecule(rng, int(rng.integers(6, 9))) for _ in range(2)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E = np.array([e for e, _ in EF], np.float32)
    F = np.concatenate([f for _, f in EF])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=cfg.triplets_only)
    return pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=cfg.triplets_only)


def test_hybrid_dp_ep_grads_match_single_device():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig
    from gemnet_pytorch_tpu.data.padding import PadDims
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.parallel.hybrid import (
        build_hybrid_batch, make_hybrid_loss_and_grad, make_hybrid_mesh,
        shard_hybrid_batch,
    )

    cfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=8, emb_size_rbf=8,
        emb_size_cbf=8, emb_size_sbf=8, emb_size_bil_quad=8, emb_size_bil_trip=8,
        triplets_only=False, direct_forces=True,
    )
    dims = PadDims(n_mol=2, n_atoms=32, n_edges=256, n_triplets=1024, kmax3=16,
                   n_int_edges=256, n_intm=1024, n_quads=4096, kmax4=64)
    shards = [_shard(s, cfg, dims) for s in range(2)]

    model = make_model(cfg)
    jb0 = {k: jnp.asarray(v) for k, v in shards[0].items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jb0))

    def parts(E, F, b):
        m = b["mol_mask"].astype(jnp.float32)[:, None]
        am = b["atom_mask"].astype(jnp.float32)[:, None]
        num = (jnp.sum(jnp.abs(E - b["E"]) * m)
               + jnp.sum(jnp.abs(F[:, 0, :] - b["F"]) * am))
        den = jnp.sum(m) + jnp.sum(am)
        return num, den

    # single-device reference over the union of shards
    def loss_single(variables):
        num = den = 0.0
        for b in shards:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            E, F, _ = energy_and_forces(model, variables, jb)
            n, d = parts(E, F, jb)
            num, den = num + n, den + d
        return num / den

    loss_ref, g_ref = jax.value_and_grad(loss_single)(variables)

    mesh = make_hybrid_mesh(2, 2)
    hybrid = build_hybrid_batch(shards, n_ep=2)
    sharded = shard_hybrid_batch(hybrid, mesh)
    lg = make_hybrid_loss_and_grad(model, mesh, parts)
    loss, grads = lg(variables, sharded)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat = jax.tree_util.tree_leaves(grads)
    bad = []
    for (path, a), b in zip(flat_ref, flat):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        if err > 1e-4 + 1e-3 * np.abs(a).max():
            bad.append(("/".join(str(getattr(k, "key", k)) for k in path),
                        float(err)))
    assert not bad, bad[:8]


# ======================================================================
# dp x halo (rung 2b inside each dp group)
# ======================================================================


def _mols(seed, n=2):
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule

    rng = np.random.default_rng(seed)
    mols = [random_molecule(rng, int(rng.integers(6, 9))) for _ in range(n)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E = np.array([e for e, _ in EF], np.float32)
    F = np.concatenate([f for _, f in EF])
    return N, Z, R, E, F


def _dp_halo_setup(direct_forces=True):
    """2 dp shards x 2 molecules; returns (cfg, model, variables,
    union_batch, graph_tuples)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.models import make_model

    cfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=8, emb_size_rbf=8,
        emb_size_cbf=8, emb_size_sbf=8, emb_size_bil_quad=8, emb_size_bil_trip=8,
        triplets_only=False, direct_forces=direct_forces,
    )
    shards = [_mols(s) for s in range(2)]
    tuples = []
    for N, Z, R, E, F in shards:
        g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=False)
        tuples.append((g, Z, R, E, F))

    # union batch (all 4 molecules) for the single-device reference
    N_u = np.concatenate([s[0] for s in shards])
    Z_u = np.concatenate([s[1] for s in shards])
    R_u = np.concatenate([s[2] for s in shards])
    E_u = np.concatenate([s[3] for s in shards])
    F_u = np.concatenate([s[4] for s in shards])
    g_u = build_graph(R_u, N_u, cfg.cutoff, cfg.int_cutoff, triplets_only=False)
    dims = PadDims(n_mol=4, n_atoms=48, n_edges=512, n_triplets=2048, kmax3=16,
                   n_int_edges=512, n_intm=2048, n_quads=8192, kmax4=64
                   ).grow_to(_scale_graph_dims(g_u, 1.1), 4, len(Z_u))
    union = pad_batch(g_u, Z_u, R_u, dims, E=E_u, F=F_u, triplets_only=False)
    union = {k: jnp.asarray(v) for k, v in union.items()}

    model = make_model(cfg)
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), union))
    return cfg, model, variables, union, tuples


def test_dp_halo_grads_match_single_device():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces
    from gemnet_pytorch_tpu.parallel.hybrid import (
        build_dp_halo_batch, make_dp_halo_loss_and_grad, make_hybrid_mesh,
        shard_dp_halo_batch,
    )

    cfg, model, variables, union, tuples = _dp_halo_setup()

    def parts(E, F, b):
        m = b["mol_mask"].astype(jnp.float32)[:, None]
        am = b["atom_mask"].astype(jnp.float32)[:, None]
        num = (jnp.sum(jnp.abs(E - b["E"]) * m)
               + jnp.sum(jnp.abs(F[:, 0, :] - b["F"]) * am))
        den = jnp.sum(m) + jnp.sum(am)
        return num, den

    def loss_single(variables):
        E, F, _ = energy_and_forces(model, variables, union)
        num, den = parts(E, F, union)
        return num / den

    loss_ref, g_ref = jax.value_and_grad(loss_single)(variables)

    mesh = make_hybrid_mesh(2, 2)
    stacked, pads = build_dp_halo_batch(tuples, n_ep=2)
    sharded = shard_dp_halo_batch(stacked, mesh)
    lg = make_dp_halo_loss_and_grad(model, mesh, parts)
    loss, grads = lg(variables, sharded)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat = jax.tree_util.tree_leaves(grads)
    assert len(flat) == len(flat_ref)
    for a, b in zip(flat, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_dp_halo_train_step_matches_single_device():
    """One full dp x halo optimizer step == one single-device trainer step on
    the union batch (same initial state): params, EMA, metrics."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.parallel.hybrid import (
        build_dp_halo_batch, make_dp_halo_train_step, make_hybrid_mesh,
        shard_dp_halo_batch,
    )
    from gemnet_pytorch_tpu.training import Trainer

    cfg, model, variables, union, tuples = _dp_halo_setup(direct_forces=False)
    tcfg = TrainConfig(batch_size=4, weight_decay=2e-6)

    trainer_ref = Trainer(model, tcfg)
    state_ref = trainer_ref.init_state(dict(variables))
    step_ref = trainer_ref.train_step_fn()
    state_ref, metrics_ref, _ = step_ref(state_ref, union, jnp.asarray(1.0))

    trainer = Trainer(model, tcfg)
    state = trainer.init_state(dict(variables))
    mesh = make_hybrid_mesh(2, 2)
    stacked, pads = build_dp_halo_batch(tuples, n_ep=2)
    sharded = shard_dp_halo_batch(stacked, mesh)
    step = make_dp_halo_train_step(trainer, mesh)
    state, metrics = step(state, sharded, jnp.asarray(1.0))

    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.params), np.asarray(state_ref.params),
        rtol=5e-4, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(state.ema_params), np.asarray(state_ref.ema_params),
        rtol=5e-4, atol=1e-7)
