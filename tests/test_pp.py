"""Pipeline parallelism (parallel/pp.py): exactness vs the single-device
model, plus the minimal repro of the jax scan/custom_vjp bug that forces the
unrolled tick loop."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _make_graphs, _pad, _shared_dims, _small_cfg
from gemnet_pytorch_tpu.models import energy_and_forces, make_model
from gemnet_pytorch_tpu.parallel.mesh import make_mesh
from gemnet_pytorch_tpu.parallel.pp import (
    make_pp_energy_and_forces,
    make_pp_loss_and_grad,
    merge_pp_variables,
    split_pp_variables,
    stack_microbatches,
)


def _setup(cfg, n_micro, seed0=0):
    model = make_model(cfg)
    tups = [
        _make_graphs(cfg, n_molecules=2, seed=seed0 + s, max_atoms=7)
        for s in range(n_micro)
    ]
    dims = _shared_dims(cfg, tups)
    shards = [_pad(cfg, t, dims) for t in tups]
    sample = {k: jnp.asarray(v) for k, v in shards[0].items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    batches = {k: jnp.asarray(v) for k, v in stack_microbatches(shards).items()}
    return model, variables, shards, batches


def _tiny_cfg(**kw):
    import dataclasses

    cfg = _small_cfg(**kw)
    return dataclasses.replace(
        cfg,
        emb_size_atom=32, emb_size_edge=32, emb_size_trip=16, emb_size_quad=8,
        emb_size_bil_trip=16, emb_size_bil_quad=8,
    )


@pytest.mark.parametrize(
    "triplets_only,direct_forces,n_stages",
    [(False, True, 2), (True, False, 2), (False, False, 2), (False, True, 1)],
)
def test_pp_matches_single_device(triplets_only, direct_forces, n_stages):
    cfg = _tiny_cfg(triplets_only=triplets_only, direct_forces=direct_forces)
    M = 3
    model, variables, shards, batches = _setup(cfg, M)
    mesh = make_mesh(n_stages, axis_names=("pp",))
    pre, stage = split_pp_variables(variables, cfg.num_blocks, n_stages)
    ef = make_pp_energy_and_forces(model, mesh, M)
    E, F = ef(pre, stage, batches)
    for i, b in enumerate(shards):
        bj = {k: jnp.asarray(v) for k, v in b.items()}
        Er, Fr, _ = energy_and_forces(model, variables, bj)
        np.testing.assert_allclose(np.asarray(E[i]), np.asarray(Er),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(F[i]), np.asarray(Fr),
                                   rtol=2e-5, atol=2e-6)


def test_pp_gradients_match_single_device():
    """Parameter gradients through the pipeline — including the force-training
    double backward (-dE/dR inside the loss) — equal the summed single-device
    gradients over the microbatches."""
    cfg = _tiny_cfg(triplets_only=False, direct_forces=False)
    M, S = 4, 2
    model, variables, shards, batches = _setup(cfg, M)
    mesh = make_mesh(S, axis_names=("pp",))
    pre, stage = split_pp_variables(variables, cfg.num_blocks, S)

    def loss_fn(E, F, b):
        m = b["mol_mask"].astype(jnp.float32)[:, :, None]
        am = b["atom_mask"].astype(jnp.float32)[:, :, None]
        return (
            jnp.sum(jnp.abs(E - b["E"]) * m)
            + jnp.sum(jnp.abs(F[:, :, 0, :] - b["F"]) * am)
        )

    lg = make_pp_loss_and_grad(model, mesh, loss_fn, M)
    loss, (pre_g, stage_g) = lg(pre, stage, batches)

    def single_loss(params):
        tot = 0.0
        for b in shards:
            bj = {k: jnp.asarray(v) for k, v in b.items()}
            E1, F1, _ = energy_and_forces(model, params, bj)
            m = bj["mol_mask"].astype(jnp.float32)[:, None]
            am = bj["atom_mask"].astype(jnp.float32)[:, None]
            tot = (
                tot
                + jnp.sum(jnp.abs(E1 - bj["E"]) * m)
                + jnp.sum(jnp.abs(F1[:, 0, :] - bj["F"]) * am)
            )
        return tot

    ref_loss, ref_g = jax.value_and_grad(single_loss)(variables)
    assert np.isclose(float(loss), float(ref_loss), rtol=1e-5)

    merged = merge_pp_variables(pre_g, stage_g, cfg.num_blocks, S)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_g["params"])[0]
    flat_pp = dict(jax.tree_util.tree_flatten_with_path(merged["params"])[0])
    assert len(flat_pp) == len(flat_ref)
    # fp reassociation across the pipeline's psum/ppermute: a handful of
    # elements of the L1 double-backward land at ~1e-3 relative
    for path, v in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pp[path]), np.asarray(v), rtol=2e-3, atol=1e-4,
            err_msg=str(path),
        )


def test_pp_train_step_matches_single_device():
    """The FULL pp train step (GPipe grads + global-norm clip spanning the
    pre/stage split + flat AdamW/Adam + EMA) matches a single-device flat
    optimizer step on the same flattened microbatch loss, over 3 steps."""
    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.parallel.pp import PPTrainer
    from gemnet_pytorch_tpu.training import Trainer

    cfg = _tiny_cfg(triplets_only=False, direct_forces=False)
    M, S = 3, 2
    model, variables, shards, batches = _setup(cfg, M)
    mesh = make_mesh(S, axis_names=("pp",))
    tcfg = TrainConfig(batch_size=2, weight_decay=2e-6, rho_force=0.9,
                       loss="rmse", warmup_steps=2, grad_clip_max=1e-3)
    trainer = Trainer(model, tcfg)
    ref_state = trainer.init_state(dict(variables))
    pptr = PPTrainer(trainer, mesh, M)
    pp_state = pptr.init_state(dict(variables))

    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in shards]

    @jax.jit
    def ref_step(state, lr_scale):
        def loss_fn(flat):
            params = trainer.unravel(flat)
            vs = {"params": params}
            if state.scales:
                vs["scale_factors"] = state.scales
            Es, Fs = [], []
            for b in jbatches:
                E1, F1, _ = energy_and_forces(model, vs, b)
                Es.append(E1)
                Fs.append(F1)
            E = jnp.concatenate(Es)
            F = jnp.concatenate(Fs)
            fb = {
                "E": jnp.concatenate([b["E"] for b in jbatches]),
                "F": jnp.concatenate([b["F"] for b in jbatches]),
                "mol_mask": jnp.concatenate([b["mol_mask"] for b in jbatches]),
                "atom_mask": jnp.concatenate([b["atom_mask"] for b in jbatches]),
            }
            mE, vE, mF, vF = trainer._split_outputs(E, F)
            return trainer.loss_metrics_from_outputs(mE, vE, mF, vF, fb)

        (_, (metrics, counts)), g = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return trainer.apply_update(state, g, metrics, counts, lr_scale), metrics

    losses_pp, losses_ref = [], []
    for _ in range(3):
        pp_state, loss_pp = pptr.train_on_microbatches(pp_state, shards, 1.0)
        ref_state, ref_metrics = ref_step(ref_state, jnp.asarray(1.0))
        losses_pp.append(float(loss_pp))
        losses_ref.append(float(ref_metrics["loss"]))
    np.testing.assert_allclose(losses_pp, losses_ref, rtol=1e-5)

    ref_tree = trainer.params_tree(ref_state.params)
    pp_tree = pptr.merged_variables(pp_state)["params"]
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    flat_pp = dict(jax.tree_util.tree_flatten_with_path(pp_tree)[0])
    assert len(flat_pp) == len(flat_ref)
    for path, v in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pp[path]), np.asarray(v), rtol=2e-3, atol=2e-6,
            err_msg=str(path),
        )
    # EMA shadows track too
    ema_pp = pptr.merged_variables(pp_state, ema=True)["params"]
    ema_ref = trainer.ema_tree(ref_state)
    for path, v in jax.tree_util.tree_flatten_with_path(ema_ref)[0]:
        got = dict(jax.tree_util.tree_flatten_with_path(ema_pp)[0])[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(v), rtol=2e-3, atol=2e-6,
            err_msg=str(path),
        )
    # stage state is genuinely sharded over pp (1/S per chip)
    st = pp_state.opt_state["stage"]
    spec = st.mu.sharding.spec
    assert spec and spec[0] == "pp", spec


def test_split_merge_roundtrip():
    cfg = _tiny_cfg()
    model, variables, _, _ = _setup(cfg, 1)
    for S in (1, 2):
        pre, stage = split_pp_variables(variables, cfg.num_blocks, S)
        back = merge_pp_variables(pre, stage, cfg.num_blocks, S)
        flat_a = jax.tree_util.tree_flatten_with_path(dict(variables))[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        assert len(flat_b) == len(flat_a)
        for path, v in flat_a:
            np.testing.assert_array_equal(np.asarray(flat_b[path]), np.asarray(v))


def test_jax_scan_customvjp_int_residual_bug():
    """Minimal repro of the jax 0.9.0 bug that forces parallel/pp.py to
    unroll its tick loop: a custom_vjp op taking an integer operand that is
    itself computed inside a lax.scan body (or delivered as scan xs) gets its
    residuals mis-wired under grad-of-grad — the vjp rule receives a float32
    array (sometimes of a different shape) in the integer residual's slot.
    When this test starts FAILING (the scan variant matches the unrolled
    one), the upstream bug is fixed and pp's tick loop can become a scan."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def seg_sum(a, b, ids, n):
        return jax.ops.segment_sum(a * b, ids, num_segments=n)

    def fwd(a, b, ids, n):
        return seg_sum(a, b, ids, n), (a, b, ids)

    seen = []

    def bwd(n, res, cot):
        a, b, ids = res
        seen.append(ids.dtype)
        cr = cot[ids.astype(jnp.int32)]
        return cr * b, cr * a, None

    seg_sum.defvjp(fwd, bwd)

    ids_all = jnp.array([[0, 0, 1, 1], [0, 1, 1, 1]], jnp.int32)
    a0 = jnp.arange(4.0)
    b0 = jnp.arange(4.0) + 1

    def inner(a, b):
        def step(c, t):
            ids = ids_all[jnp.clip(t, 0, 1)]
            return c + jnp.sum(seg_sum(a, b, ids, 2) ** 2), None
        out, _ = jax.lax.scan(step, 0.0, jnp.arange(2))
        return out

    outer = lambda a, b: jnp.sum(jax.grad(inner)(a, b) ** 2)
    broken = False
    try:
        jax.grad(outer)(a0, b0)
    except TypeError:
        broken = True  # mis-wired residual shapes blow up downstream
    broken = broken or any(d != jnp.int32 for d in seen)
    assert broken, (
        "jax scan/custom_vjp int-residual bug appears FIXED — consider "
        "restoring lax.scan in parallel/pp.py's tick loop"
    )
