"""Multi-chip data parallelism on the virtual CPU mesh: DP losses/gradients
must equal single-device results on the union batch (exact global masked
means), and the graft entry points must compile and run."""

import numpy as np
import pytest


def _setup(n_shards, synthetic_npz):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer
    from gemnet_pytorch_tpu.data.padding import PadDims, pad_batch
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True,
    )
    tcfg = TrainConfig(weight_decay=2e-6, loss="mae", rho_force=0.5)
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)

    # n_shards shards of 2 molecules each, one shared PadDims
    shard_idx = [[2 * s, 2 * s + 1] for s in range(n_shards)]
    graphs = [c.build(idx) for idx in shard_idx]
    dims = PadDims(n_mol=2, n_atoms=32, n_edges=256, n_triplets=1024, kmax3=12)
    shards = [
        pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=True)
        for (g, Z, R, E, F) in graphs
    ]
    model = make_model(mcfg)
    sample = {k: jnp.asarray(v) for k, v in shards[0].items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), sample))
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)
    return trainer, state, shards


def test_dp_matches_weighted_single_device(synthetic_npz):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.parallel import (
        make_dp_train_step, make_mesh, shard_batch_to_mesh, stack_shards,
    )

    n = 4
    trainer, state, shards = _setup(n, synthetic_npz)
    mesh = make_mesh(n)
    dp_step = make_dp_train_step(trainer, mesh)
    stacked = shard_batch_to_mesh(stack_shards(shards), mesh)
    new_state, metrics, counts = dp_step(state, stacked, jnp.asarray(1.0))

    # single-device global metrics: weighted mean of per-shard sums
    e_num = e_den = f_num = f_den = 0.0
    for b in shards:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        _, (m, c) = trainer._loss_and_metrics(state.params, state.scales, jb)
        e_num += float(m["energy_mae"]) * float(c["n_mol"])
        e_den += float(c["n_mol"])
        f_num += float(m["force_mae"]) * float(c["n_atoms"])
        f_den += float(c["n_atoms"])
    np.testing.assert_allclose(
        float(metrics["energy_mae"]), e_num / e_den, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["force_mae"]), f_num / f_den, rtol=1e-5
    )
    assert float(counts["n_mol"]) == e_den

    # params updated and replicated-consistent
    p0 = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert np.isfinite(p0).all()


def test_dp_grads_match_merged_batch(synthetic_npz):
    """psum'd DP gradient == gradient of the same loss on the shards evaluated
    jointly (sum over shards of per-shard grads with global denominators)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.parallel import make_mesh
    from jax.sharding import PartitionSpec as P

    n = 2
    trainer, state, shards = _setup(n, synthetic_npz)
    mesh = make_mesh(n)

    def shard_loss(params, batch):
        batch = {k: v[0] for k, v in batch.items()}
        loss, _ = trainer._loss_and_metrics(params, state.scales, batch, axis_name="dp")
        return loss

    def dp_grad(params, stacked):
        g = jax.grad(shard_loss)(params, stacked)
        return jax.lax.psum(g, "dp")

    sharded = jax.jit(
        jax.shard_map(
            dp_grad, mesh=mesh, in_specs=(P(), P("dp")), out_specs=P(),
            check_vma=False,
        )
    )
    from gemnet_pytorch_tpu.parallel import shard_batch_to_mesh, stack_shards

    stacked = shard_batch_to_mesh(stack_shards(shards), mesh)
    g_dp = sharded(state.params, stacked)

    # reference: loss computed as global weighted mean over both shards
    def joint_loss(params):
        total = 0.0
        nums = []
        for b in shards:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            mean_E, _, mean_F, _ = trainer._predict(params, state.scales, jb)
            m = jb["mol_mask"].astype(jnp.float32)[:, None]
            am = jb["atom_mask"].astype(jnp.float32)[:, None]
            nums.append((
                jnp.sum(jnp.abs(mean_E - jb["E"]) * m), jnp.sum(m),
                jnp.sum(jnp.abs(mean_F - jb["F"]) * am), jnp.sum(am) * 3,
            ))
        e_num = sum(x[0] for x in nums); e_den = sum(x[1] for x in nums)
        f_num = sum(x[2] for x in nums); f_den = sum(x[3] for x in nums)
        return 0.5 * e_num / e_den + 0.5 * f_num / f_den

    g_ref = jax.grad(joint_loss)(state.params)
    flat_dp = jax.tree_util.tree_leaves(g_dp)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    for a, b in zip(flat_dp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_graft_entry_points():
    import sys

    sys.path.insert(0, "/root/repo")
    import jax

    import __graft_entry__ as ge

    fn, (variables, batch) = ge.entry()
    E, F = jax.jit(fn)(variables, batch)
    assert np.isfinite(np.asarray(E)).all()
    ge.dryrun_multichip(2)


def test_dp_mve_var_metrics_are_global(synthetic_npz):
    """Under MVE + dp, the var diagnostics must be GLOBAL (psum'd num/den)
    ratios, not per-device means — they leave the shard_map with replicated
    out_specs."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data import DataContainer
    from gemnet_pytorch_tpu.data.padding import PadDims, pad_batch
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.parallel import (
        make_dp_train_step, make_mesh, shard_batch_to_mesh, stack_shards,
    )
    from gemnet_pytorch_tpu.training import Trainer

    mcfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True, num_targets=2,
    )
    tcfg = TrainConfig(weight_decay=2e-6, mve=True, rho_force=0.5)
    c = DataContainer(synthetic_npz, cutoff=5.0, int_cutoff=10.0, triplets_only=True)
    n = 2
    graphs = [c.build([2 * s, 2 * s + 1]) for s in range(n)]
    dims = PadDims(n_mol=2, n_atoms=32, n_edges=256, n_triplets=1024, kmax3=12)
    shards = [
        pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=True)
        for (g, Z, R, E, F) in graphs
    ]
    model = make_model(mcfg)
    sample = {k: jnp.asarray(v) for k, v in shards[0].items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), sample))
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)

    mesh = make_mesh(n)
    dp_step = make_dp_train_step(trainer, mesh)
    stacked = shard_batch_to_mesh(stack_shards(shards), mesh)
    _, metrics, _ = dp_step(state, stacked, jnp.asarray(1.0))

    ev_num = ev_den = fv_num = fv_den = 0.0
    for b in shards:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        _, (m, cts) = trainer._loss_and_metrics(state.params, state.scales, jb)
        ev_num += float(m["energy_var"]) * float(cts["n_mol"])
        ev_den += float(cts["n_mol"])
        fv_num += float(m["force_var"]) * float(cts["n_atoms"])
        fv_den += float(cts["n_atoms"])
    np.testing.assert_allclose(
        float(metrics["energy_var"]), ev_num / ev_den, rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["force_var"]), fv_num / fv_den, rtol=1e-5)


def test_dp_predict_matches_single_device(synthetic_npz):
    """make_dp_predict_fn: sharded inference returns exactly the per-shard
    single-device energies/forces (serving path, no collectives)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces
    from gemnet_pytorch_tpu.parallel import (
        make_dp_predict_fn,
        make_mesh,
        shard_batch_to_mesh,
        stack_shards,
    )

    n = 4
    trainer, state, shards = _setup(n, synthetic_npz)
    model = trainer.model
    variables = {"params": trainer.params_tree(state.params)}
    if state.scales:
        variables["scale_factors"] = state.scales

    mesh = make_mesh(n)
    predict = make_dp_predict_fn(model, mesh)
    stacked = shard_batch_to_mesh(stack_shards(shards), mesh)
    E, F = predict(variables, stacked)
    assert E.shape[0] == n and F.shape[0] == n

    for s, shard in enumerate(shards):
        jb = {k: jnp.asarray(v) for k, v in shard.items()}
        E1, F1, _ = energy_and_forces(model, variables, jb)
        np.testing.assert_allclose(np.asarray(E[s]), np.asarray(E1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(F[s]), np.asarray(F1),
                                   rtol=1e-5, atol=1e-5)


def test_dp_eval_step_packed_with_zero_mask_padding(synthetic_npz):
    """make_dp_eval_step on PACKED rows: a 4-device group fed 3 real shards +
    1 zero-masked pad row reports exactly the weighted single-device metrics
    of the 3 real shards (the pad contributes 0 to every num/den pair) —
    the remainder-group convention of train.py's mesh-parallel eval."""
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.parallel import (
        make_dp_eval_step, make_mesh, shard_batch_to_mesh,
    )

    trainer, state, shards = _setup(3, synthetic_npz)
    rows = [trainer.packer.pack(b) for b in shards]
    rows.append(trainer.packer.zero_masks(rows[0]))
    mesh = make_mesh(4)
    dp_eval = make_dp_eval_step(trainer, mesh)
    stacked = shard_batch_to_mesh(np.stack(rows), mesh)
    # EMA params (what train.py's EMA-swapped eval passes), flat vector
    metrics, counts = dp_eval(state.ema_params, state.scales, stacked)

    keys = [k for k in trainer.tracked_metrics if k != "loss"]
    num = {k: 0.0 for k in keys}
    n_mol = n_atoms = 0.0
    eval_step = trainer.eval_step_fn()
    for b in shards:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        m, c = eval_step(state.ema_params, state.scales, jb)
        for k in keys:
            w = c["n_mol"] if k == "energy_mae" else c["n_atoms"]
            num[k] += float(m[k]) * float(w)
        n_mol += float(c["n_mol"])
        n_atoms += float(c["n_atoms"])
    assert float(counts["n_mol"]) == n_mol  # pad row contributed nothing
    assert float(counts["n_atoms"]) == n_atoms
    expected = {k: num[k] / (n_mol if k == "energy_mae" else n_atoms)
                for k in keys}
    # the composite loss mixes the mol- and atom-denominator terms
    rho = trainer.rho_force
    expected["loss"] = (
        (1 - rho) * expected["energy_mae"] + rho * expected["force_mae"]
    )
    for k, v in expected.items():
        np.testing.assert_allclose(
            float(metrics[k]), v, rtol=2e-5, atol=1e-7, err_msg=k
        )
