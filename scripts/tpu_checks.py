#!/usr/bin/env python
"""On-TPU Pallas A/B verification + train-step cost ablation.

Two jobs in one TPU process (the tunnel serializes TPU access):

1. `verify`: runs segment_outer_sum / segment_gather_contract and the full
   GemNet-Q forward+grads with implementation="pallas" vs "xla" ON THE REAL
   CHIP and asserts allclose — the reference oracle for these layouts is
   tests/test_segment_outer.py (interpret-mode); this closes the gap between
   "interpret-mode correct" and "Mosaic-lowered correct" (VERDICT item 3).

2. `ablate`: times the components of the full training step (bench.py
   workload) to locate where the 19x train/forward ratio goes
   (VERDICT item 2): forward, inner force grad, single vs double backward,
   pallas-vs-xla kernels, gather-transpose scatters, optimizer.

Run: python scripts/tpu_checks.py [verify|ablate|all]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, windows=3, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def make_bench_batch(cfg, triplets_only=False):
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule

    rng = np.random.default_rng(0)
    mols = [random_molecule(rng, int(rng.integers(8, 13))) for _ in range(32)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=triplets_only)
    base = PadDims(n_mol=32, n_atoms=16, n_edges=128, n_triplets=512, kmax3=4,
                   n_int_edges=64, n_intm=512, n_quads=512, kmax4=4)
    dims = base.grow_to(_scale_graph_dims(g, 1.05), 32, len(Z))
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E_t = np.array([e for e, _ in EF], np.float32)
    F_t = np.concatenate([f for _, f in EF])
    batch_np = pad_batch(g, Z, R, dims, E=E_t, F=F_t, triplets_only=triplets_only)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    return g, dims, batch


def rel_err(x, y):
    x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
    denom = np.maximum(np.abs(y).max(), 1e-30)
    return float(np.abs(x - y).max() / denom)


def verify():
    from gemnet_pytorch_tpu.ops.pallas.segment_outer import (
        segment_gather_contract,
        segment_outer_sum,
    )

    print("== verify: kernels pallas vs xla on", jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    # (S, M, n_rows, n_segments) incl. the bench shapes and odd/kmax-heavy ones
    shapes = [
        (7, 64, 25600, 2944),     # trip bench shape
        (49, 32, 192512, 2944),   # quad bench shape
        (49, 32, 4096, 128),      # small, kmax-heavy (few segments, many rows)
        (7, 64, 512, 32),         # minimal
        (25, 48, 65536, 1024),    # odd S, M not x128
    ]
    ok = True
    for S, M, n, nseg in shapes:
        # sorted ids with a skewed distribution (some segments heavy)
        ids = np.sort(rng.integers(0, nseg, size=n)).astype(np.int32)
        from gemnet_pytorch_tpu.data.padding import EDGE_BLOCK

        bounds = np.arange(0, nseg + EDGE_BLOCK, EDGE_BLOCK)
        splits = np.searchsorted(ids, bounds, side="left").astype(np.int32)
        a = jnp.asarray(rng.standard_normal((n, S)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((n, M)), jnp.float32)
        ids_j = jnp.asarray(ids)
        splits_j = jnp.asarray(splits)

        f_p = jax.jit(lambda a, b: segment_outer_sum(a, b, ids_j, splits_j, nseg, "pallas"))
        f_x = jax.jit(lambda a, b: segment_outer_sum(a, b, ids_j, splits_j, nseg, "xla"))
        out_p = jax.device_get(f_p(a, b))
        out_x = jax.device_get(f_x(a, b))
        e1 = rel_err(out_p, out_x)

        cot = jnp.asarray(rng.standard_normal((S, nseg, M)), jnp.float32)
        g_p = jax.jit(lambda c, a, b: segment_gather_contract(c, a, b, ids_j, splits_j, "pallas"))
        g_x = jax.jit(lambda c, a, b: segment_gather_contract(c, a, b, ids_j, splits_j, "xla"))
        da_p, db_p = jax.device_get(g_p(cot, a, b))
        da_x, db_x = jax.device_get(g_x(cot, a, b))
        e2 = max(rel_err(da_p, da_x), rel_err(db_p, db_x))
        status = "OK " if max(e1, e2) < 2e-5 else "FAIL"
        ok &= status == "OK "
        print(f"  [{status}] S={S:3d} M={M:3d} n={n:7d} nseg={nseg:5d}  "
              f"fwd rel_err={e1:.2e}  bwd rel_err={e2:.2e}", flush=True)

    # full model: forward + training grads, pallas vs xla
    import dataclasses

    from gemnet_pytorch_tpu.config import ModelConfig, load_yaml_config
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model

    cfg_dict = load_yaml_config("config.yaml")
    cfg = ModelConfig.from_dict(cfg_dict)  # GemNet-Q, -dE/dR forces
    # matmul_precision="highest": the surrounding Dense/einsum matmuls must
    # be exact fp32 or their bf16 MXU rounding amplifies the kernels' ~1e-7
    # difference to bf16-ulp noise and the A/B can't resolve kernel bugs
    cfg = dataclasses.replace(cfg, matmul_precision="highest")
    _, _, batch = make_bench_batch(cfg)
    model_p = make_model(dataclasses.replace(cfg, bilinear_implementation="pallas"))
    model_x = make_model(dataclasses.replace(cfg, bilinear_implementation="xla"))
    variables = jax.jit(model_p.init)(jax.random.PRNGKey(0), batch)

    def loss(model, params):
        E, F, _ = energy_and_forces(model, {"params": params, **{k: v for k, v in variables.items() if k != "params"}}, batch)
        m = batch["atom_mask"].astype(jnp.float32)[:, None]
        return jnp.sum(jnp.abs(E[:, 0]) * batch["mol_mask"]) * 1e-3 + jnp.sum(
            jnp.abs(F[:, 0, :]) * m
        )

    lp, gp = jax.jit(jax.value_and_grad(lambda p: loss(model_p, p)))(variables["params"])
    lx, gx = jax.jit(jax.value_and_grad(lambda p: loss(model_x, p)))(variables["params"])
    le = rel_err(jax.device_get(lp), jax.device_get(lx))
    flat_p = jax.tree_util.tree_leaves(jax.device_get(gp))
    flat_x = jax.tree_util.tree_leaves(jax.device_get(gx))
    ge = max(rel_err(p, x) for p, x in zip(flat_p, flat_x))
    status = "OK " if le < 1e-5 and ge < 1e-3 else "FAIL"
    ok &= status == "OK "
    print(f"  [{status}] full GemNet-Q loss+grads (double backward): "
          f"loss rel_err={le:.2e}  grad rel_err={ge:.2e}", flush=True)
    print("verify:", "ALL OK" if ok else "FAILURES", flush=True)
    return ok


def ablate():
    import dataclasses

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig, load_yaml_config
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.training import Trainer

    print("== ablate: train-step cost breakdown on", jax.devices(), flush=True)
    cfg_dict = load_yaml_config("config.yaml")
    cfg = ModelConfig.from_dict(cfg_dict)  # -dE/dR
    tcfg = TrainConfig.from_dict(cfg_dict)
    g, dims, batch = make_bench_batch(cfg)
    print(f"  batch: {g.n_edges} edges, {g.n_triplets} trip, {g.n_quads} quads "
          f"(padded {dims.n_triplets}/{dims.n_quads})", flush=True)

    model = make_model(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    scales = variables.get("scale_factors", {})

    results = {}

    # (a) forward energy only (no force grad)
    @jax.jit
    def fwd_E(params, batch):
        (E, _), _ = model.apply({"params": params, "scale_factors": scales}, batch,
                                batch["R"], mutable=[])
        return E

    results["a_fwd_E"] = timeit(fwd_E, params, batch)

    # (b) energy + forces (-dE/dR): fwd + inner bwd
    @jax.jit
    def fwd_EF(params, batch):
        E, F, _ = energy_and_forces(model, {"params": params, "scale_factors": scales}, batch)
        return F

    results["b_fwd_EF"] = timeit(fwd_EF, params, batch)

    # (c) grads of energy-only loss (single backward)
    @jax.jit
    def grad_E(params, batch):
        def f(p):
            (E, _), _ = model.apply({"params": p, "scale_factors": scales}, batch,
                                    batch["R"], mutable=[])
            return jnp.sum(jnp.abs(E[:, 0]) * batch["mol_mask"])
        return jax.grad(f)(params)

    results["c_grad_Eloss"] = timeit(lambda p, b: grad_E(p, b)["frequencies"], params, batch)

    # (d) grads of the full loss (double backward), no optimizer
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(dict(variables))

    @jax.jit
    def grad_full(params, batch):
        grad_fn = jax.value_and_grad(
            lambda p: trainer._loss_and_metrics(p, scales, batch), has_aux=True
        )
        (_, _), grads = grad_fn(params)
        return grads["frequencies"]

    results["d_grad_full"] = timeit(grad_full, params, batch, iters=10)

    # (e) optimizer+EMA only (fixed grads, flat layout — see flat_opt.py)
    grads_flat = jax.jit(lambda p, b: jax.value_and_grad(
        lambda q: trainer._loss_and_metrics(q, scales, b), has_aux=True
    )(p)[1])(state.params, batch)

    @jax.jit
    def opt_only(grads, opt_state, params, ema):
        from gemnet_pytorch_tpu.training import flat_opt

        return flat_opt.apply_update(
            grads, opt_state, params, ema, jnp.asarray(1.0, jnp.float32),
            schedule=trainer._sched_base, learning_rate=tcfg.learning_rate,
            grad_clip_max=tcfg.grad_clip_max, ema_decay=tcfg.ema_decay)

    results["e_optimizer"] = timeit(
        lambda g: opt_only(g, state.opt_state, state.params, state.ema_params)[0],
        grads_flat)

    # (f) full train step (canonical bench metric)
    step = trainer.train_step_fn()
    lr = jnp.asarray(1.0, jnp.float32)

    def train_once(s):
        s2, m, _ = step(s, batch, lr)
        return m["loss"]

    results["f_train_step"] = timeit(train_once, state, iters=10)

    # (g) full train step with XLA bilinear kernels
    model_x = make_model(dataclasses.replace(cfg, bilinear_implementation="xla"))
    trainer_x = Trainer(model_x, tcfg)
    state_x = trainer_x.init_state(dict(variables))
    step_x = trainer_x.train_step_fn()
    results["g_train_step_xla"] = timeit(
        lambda s: step_x(s, batch, lr)[1]["loss"], state_x, iters=10)

    # (h) train step, direct-forces model (single backward)
    cfg_d = dataclasses.replace(cfg, direct_forces=True)
    model_d = make_model(cfg_d)
    variables_d = jax.jit(model_d.init)(jax.random.PRNGKey(0), batch)
    trainer_d = Trainer(model_d, tcfg)
    state_d = trainer_d.init_state(dict(variables_d))
    step_d = trainer_d.train_step_fn()
    results["h_train_step_direct"] = timeit(
        lambda s: step_d(s, batch, lr)[1]["loss"], state_d, iters=10)

    # (i) isolated gather-transpose scatter costs (the gathers' backward)
    rng = np.random.default_rng(2)
    x_intm = jnp.asarray(rng.standard_normal((dims.n_intm, 32)), jnp.float32)
    cot_q = jnp.asarray(rng.standard_normal((dims.n_quads, 32)), jnp.float32)
    idx_abd = batch["id4_expand_abd"].astype(jnp.int32)

    @jax.jit
    def gather_bwd_abd(x, cot):
        return jax.vjp(lambda x: x[idx_abd], x)[1](cot)[0]

    results["i_scatter_abd"] = timeit(gather_bwd_abd, x_intm, cot_q)

    x_edge = jnp.asarray(rng.standard_normal((dims.n_edges, 32)), jnp.float32)
    cot_i = jnp.asarray(rng.standard_normal((dims.n_intm, 32)), jnp.float32)
    idx_db = batch["id4_expand_intm_db"].astype(jnp.int32)

    @jax.jit
    def gather_bwd_db(x, cot):
        return jax.vjp(lambda x: x[idx_db], x)[1](cot)[0]

    results["j_scatter_db"] = timeit(gather_bwd_db, x_edge, cot_i)

    # (k) trip-space gather bwd
    x_e64 = jnp.asarray(rng.standard_normal((dims.n_edges, 64)), jnp.float32)
    cot_t = jnp.asarray(rng.standard_normal((dims.n_triplets, 64)), jnp.float32)
    idx_ba = batch["id3_expand_ba"].astype(jnp.int32)

    @jax.jit
    def gather_bwd_ba(x, cot):
        return jax.vjp(lambda x: x[idx_ba], x)[1](cot)[0]

    results["k_scatter_ba"] = timeit(gather_bwd_ba, x_e64, cot_t)

    for k, v in results.items():
        print(f"  {k:22s} {v*1e3:9.3f} ms", flush=True)
    return results


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("verify", "all"):
        ok = verify()
    if what in ("ablate", "all"):
        ablate()
    if what in ("verify", "all") and not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
