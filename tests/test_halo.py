"""Rung 2b halo-partitioned execution (parallel/halo.py): forward energies,
both force paths, and training gradients must match the single-device model
(edge space sharded + halo all_to_all, vma-tracked shard_map)."""

import numpy as np
import pytest


def _setup(triplets_only=False, direct_forces=True):
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
        triplets_only=triplets_only, direct_forces=direct_forces,
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
    data = dict(g=g, Z=Z, R=R, E=E, F=F,
                n_mol_pad=dims.n_mol, n_atoms_pad=dims.n_atoms)
    return model, variables, jbatch, data


def _halo_batch(data, n_shards, triplets_only):
    from gemnet_pytorch_tpu.parallel.halo import build_halo_partition

    return build_halo_partition(
        data["g"], data["Z"], data["R"], n_shards,
        E=data["E"], F=data["F"], triplets_only=triplets_only,
        n_mol_pad=data["n_mol_pad"], n_atoms_pad=data["n_atoms_pad"],
    )


def test_partition_host_invariants():
    """Host-side checks: edge coverage, pair co-location, row coverage, halo
    remap round-trips."""
    from gemnet_pytorch_tpu.parallel.halo import build_halo_partition

    _, _, _, data = _setup(triplets_only=False)
    g = data["g"]
    for S in (2, 4):
        part = build_halo_partition(data["g"], data["Z"], data["R"], S,
                                    triplets_only=False)
        # every real global edge appears exactly once across shards
        pairs = set()
        for s in range(S):
            mask = part["edge_mask"][s]
            for j in np.nonzero(mask)[0]:
                pairs.add((int(part["id_c"][s, j]), int(part["id_a"][s, j])))
        assert len(pairs) == g.n_edges
        # id_swap reverses edges locally
        for s in range(S):
            m = part["edge_mask"][s]
            sw = part["id_swap"][s]
            np.testing.assert_array_equal(
                part["id_c"][s][m], part["id_a"][s][sw[m]])
        # triplet/quad rows all covered
        assert int(part["trip_mask"].sum()) == g.n_triplets
        assert int(part["quad_mask"].sum()) == g.n_quads
        assert int(part["intm_db_mask"].sum()) == len(g.id4_expand_intm_db)
        assert int(part["intm_ca_mask"].sum()) == g.n_intm
        # local reduce ids sorted per shard
        for s in range(S):
            red = part["id3_reduce_ca"][s]
            assert np.all(np.diff(red) >= 0)


@pytest.mark.parametrize("n_shards", [2, 4])
@pytest.mark.parametrize("triplets_only", [False, True])
def test_halo_forward_matches_single_device(n_shards, triplets_only):
    import jax

    from gemnet_pytorch_tpu.models import energy_and_forces
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.halo import make_halo_apply, shard_halo_batch

    model, variables, jbatch, data = _setup(triplets_only)
    E_ref, F_ref, _ = energy_and_forces(model, variables, jbatch)

    mesh = make_mesh(n_shards, axis_names=("ep",))
    part = _halo_batch(data, n_shards, triplets_only)
    sharded = shard_halo_batch(part, mesh)
    apply_fn = make_halo_apply(model, mesh)
    E, F = apply_fn(variables, sharded)
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_ref), rtol=1e-5, atol=1e-5)
    # direct-force head: per-atom forces psum'd over shards
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref), rtol=1e-4, atol=1e-5)


def test_halo_autograd_forces_match_single_device():
    """-dE/dR through the halo-partitioned model (inner jax.grad under the
    vma-tracked shard_map, cotangents through the all_to_alls)."""
    import dataclasses

    import jax

    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.halo import make_halo_apply, shard_halo_batch

    model, variables, jbatch, data = _setup(triplets_only=False)
    model = make_model(dataclasses.replace(model.config, direct_forces=False))
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jbatch))
    E_ref, F_ref, _ = energy_and_forces(model, variables, jbatch)

    mesh = make_mesh(2, axis_names=("ep",))
    sharded = shard_halo_batch(_halo_batch(data, 2, False), mesh)
    apply_fn = make_halo_apply(model, mesh)
    E, F = apply_fn(variables, sharded)
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref), rtol=1e-4, atol=1e-5)


def test_halo_training_grads_match_single_device():
    """Parameter gradients through the halo model == single-device grads
    (jax.grad outside the vma-tracked shard_map)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.halo import (
        make_halo_loss_and_grad, shard_halo_batch,
    )

    model, variables, jbatch, data = _setup(triplets_only=False)
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

    mesh = make_mesh(2, axis_names=("ep",))
    sharded = shard_halo_batch(_halo_batch(data, 2, False), mesh)

    def loss_fn(E, F, local):
        m = local["mol_mask"].astype(jnp.float32)[:, None]
        am = local["atom_mask"].astype(jnp.float32)[:, None]
        return (
            jnp.sum(jnp.abs(E - local["E"]) * m)
            + jnp.sum(jnp.abs(F[:, 0, :] - local["F"]) * am)
        )

    lg = make_halo_loss_and_grad(model, mesh, loss_fn)
    _, g_vars = lg({"params": params, "scale_factors": scales}, sharded)
    g_halo = g_vars["params"]

    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_halo = jax.tree_util.tree_leaves(g_halo)
    bad = []
    for (path, a), b in zip(flat_ref, flat_halo):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        tol = 1e-4 + 1e-3 * np.abs(a).max()
        if err > tol:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            bad.append((name, float(err), float(np.abs(a).max())))
    assert not bad, bad[:10]


def test_halo_fixed_pads_shapes_and_exactness():
    """HaloPads lower bounds: grown pads give the requested static shapes and
    the padded partition still reproduces the single-device E/F exactly —
    the compile-once contract of the halo training path."""
    import dataclasses

    import jax

    from gemnet_pytorch_tpu.models import energy_and_forces
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.halo import (
        build_halo_partition, make_halo_apply, shard_halo_batch,
    )

    model, variables, jbatch, data = _setup(triplets_only=False)
    E_ref, F_ref, _ = energy_and_forces(model, variables, jbatch)

    natural = build_halo_partition(
        data["g"], data["Z"], data["R"], 2, triplets_only=False,
        n_mol_pad=data["n_mol_pad"], n_atoms_pad=data["n_atoms_pad"],
    )["halo_pads"]
    grown = natural.grow_to(natural, headroom=1.3)
    assert grown.covers(natural) and grown != natural

    part = build_halo_partition(
        data["g"], data["Z"], data["R"], 2,
        E=data["E"], F=data["F"], triplets_only=False, pads=grown,
        n_mol_pad=data["n_mol_pad"], n_atoms_pad=data["n_atoms_pad"],
    )
    used = part["halo_pads"]
    assert used == dataclasses.replace(
        grown, n_mol=used.n_mol, n_atoms=used.n_atoms)
    assert part["id_c"].shape == (2, 2 * grown.half)
    assert part["id3_reduce_ca"].shape == (2, grown.t_loc)
    assert part["id4_reduce_ca"].shape == (2, grown.q_loc)
    assert part["edge_halo_send_idx"].shape == (2, 2, grown.h_e)
    assert part["intm_halo_send_idx"].shape == (2, 2, grown.h_i)

    mesh = make_mesh(2, axis_names=("ep",))
    E, F = make_halo_apply(model, mesh)(variables, shard_halo_batch(part, mesh))
    np.testing.assert_allclose(np.asarray(E), np.asarray(E_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(F), np.asarray(F_ref), rtol=1e-4, atol=1e-5)


def test_halo_train_step_matches_single_device():
    """Full halo training step (flat optimizer + EMA + device metrics) tracks
    the single-device trainer step-for-step on identical init + data."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.halo import (
        make_halo_train_step, shard_halo_batch,
    )
    from gemnet_pytorch_tpu.training import Trainer

    model, variables, jbatch, data = _setup(triplets_only=False)
    tcfg = TrainConfig(weight_decay=1e-6, loss="mae", rho_force=0.5,
                       learning_rate=3e-3)

    ref_trainer = Trainer(model, tcfg)
    ref_state = ref_trainer.init_state(dict(variables))
    ref_step = ref_trainer.train_step_fn()

    halo_trainer = Trainer(model, tcfg)
    state = halo_trainer.init_state(dict(variables))
    mesh = make_mesh(2, axis_names=("ep",))
    sharded = shard_halo_batch(_halo_batch(data, 2, False), mesh)
    step = make_halo_train_step(halo_trainer, mesh)

    lr = jnp.asarray(1.0)
    for i in range(3):
        ref_state, ref_metrics, _ = ref_step(ref_state, jbatch, lr)
        state, metrics = step(state, sharded, lr)
        assert np.isclose(float(metrics["loss"]), float(ref_metrics["loss"]),
                          rtol=1e-4, atol=1e-6), i
    np.testing.assert_allclose(
        np.asarray(state.params), np.asarray(ref_state.params),
        rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state.ema_params), np.asarray(ref_state.ema_params),
        rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state.metric_acc), np.asarray(ref_state.metric_acc),
        rtol=1e-4, atol=1e-6)


def test_halo_overlap_issue_order():
    """Comm/compute overlap structure (models/interaction.py): in program
    order, BOTH of a block's halo all_to_alls (edge + intm space) are issued
    back-to-back BEFORE either space's bilinear consumes one — so each
    exchange has the other path's dense/bilinear work to overlap with (the
    TPU latency-hiding scheduler hides the ICI latency inside that gap).

    Asserted on the traced jaxpr: filtering the primitive stream to
    {all_to_all, scatter-add (the segment reduces)}, the all_to_alls of the
    forward must appear in ADJACENT PAIRS (no segment reduce between the
    edge-space and intm-space exchange of a block)."""
    import dataclasses

    import jax
    from jax.sharding import PartitionSpec as P

    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.halo import (
        EP_AXIS,
        SHARDED_KEYS,
        device_batch_halo,
        halo_in_specs,
    )

    model, variables, jbatch, data = _setup(triplets_only=False)
    part = _halo_batch(data, 4, False)
    mesh = make_mesh(4, axis_names=("ep",))
    halo_model = make_model(
        dataclasses.replace(model.config, ep_axis=EP_AXIS, ep_halo=True)
    )

    def device_fn(v, b):
        local = {k: (x[0] if k in SHARDED_KEYS else x) for k, x in b.items()}
        E, F, _ = energy_and_forces(halo_model, v, local)
        return E, F

    batch = device_batch_halo(part)
    sharded = jax.shard_map(
        device_fn, mesh=mesh, in_specs=(P(), halo_in_specs(batch)),
        out_specs=(P(), P()), check_vma=True,
    )
    jaxpr = jax.make_jaxpr(sharded)(variables, batch)

    prims: list[str] = []

    def walk(jx):
        for eqn in jx.eqns:
            prims.append(eqn.primitive.name)
            for val in eqn.params.values():
                for v in val if isinstance(val, (list, tuple)) else (val,):
                    if hasattr(v, "jaxpr"):  # ClosedJaxpr
                        walk(v.jaxpr)
                    elif hasattr(v, "eqns"):  # Jaxpr
                        walk(v)

    walk(jaxpr.jaxpr)
    events = [p for p in prims if p in ("all_to_all", "scatter-add")]
    a2a = [i for i, p in enumerate(events) if p == "all_to_all"]
    # 2 exchanges per block (direct forces: forward program only)
    assert len(a2a) == 2 * model.config.num_blocks, (len(a2a), events)
    for k in range(0, len(a2a), 2):
        assert a2a[k + 1] == a2a[k] + 1, (
            "halo exchanges must be issued as an adjacent pair before the "
            f"block's segment reduces; got event stream {events}"
        )


def test_halo_eval_step_matches_single_device():
    """make_halo_eval_step (EMA-swapped validation under --halo) reproduces
    the single-device eval metrics on the same batch, with the flat EMA
    vector as params."""
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.parallel import make_mesh
    from gemnet_pytorch_tpu.parallel.halo import (
        make_halo_eval_step, shard_halo_batch,
    )
    from gemnet_pytorch_tpu.training import Trainer

    model, variables, jbatch, data = _setup(triplets_only=False)
    tcfg = TrainConfig(weight_decay=1e-6, loss="mae", rho_force=0.5)
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(dict(variables))
    # make EMA differ from params so use-of-EMA is actually observable
    state = state.replace(ema_params=state.ema_params * 1.01)

    mesh = make_mesh(2, axis_names=("ep",))
    sharded = shard_halo_batch(_halo_batch(data, 2, False), mesh)
    ev = make_halo_eval_step(trainer, mesh)
    metrics, counts = ev(state.ema_params, state.scales, sharded)

    ref_metrics, ref_counts = trainer.eval_step_fn()(
        state.ema_params, state.scales, jbatch
    )
    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=2e-5, atol=1e-7,
            err_msg=k,
        )
    assert float(counts["n_mol"]) == float(ref_counts["n_mol"])
    assert float(counts["n_atoms"]) == float(ref_counts["n_atoms"])
