#!/usr/bin/env python
"""Benchmark: triplet+quadruplet aggregation throughput per chip, with an
analytic roofline so every number is explainable from shapes + device peaks.

Runs the flagship GemNet-Q configuration (config.yaml sizes, energy-gradient
forces) and measures the steady-state jitted FULL TRAINING STEP (loss with
force term, double backward, optimizer, EMA) — the production hot path —
reported as (real triplets + real quadruplets) processed per second per chip,
the BASELINE.json headline metric, on TWO workloads:

- small: batch of 32 COLL-like molecules (8-12 atoms, ~2.9k edges, ~183k
  quads) — the headline number (vs_baseline tracks it across rounds);
- large: 4 x 32-atom systems (~3.3k edges, ~2.3M quads, kmax4-heavy) — the
  edge/row-dense regime that motivates edge partitioning (PARALLEL.md);
  reported as "large_agg_per_s" in the same JSON line.

Roofline (gemnet_pytorch_tpu/perf/roofline.py): the chip's matmul peaks
(bf16 DEFAULT, fp32 HIGHEST) and HBM bandwidth are CALIBRATED in-process,
the Pallas kernel census is taken at trace time, XLA's own post-fusion cost
analysis covers everything else, and the JSON reports the speed-of-light
step time + MFU + HBM utilization next to the measurement. A measured time
below the model floor (sol_ms_lo) is physically impossible and flags the
run as a measurement artifact ("below_floor": true + stderr error) instead
of being reported as a win.

Timing: the forward is measured with the SAME flat-parameter signature as
the train step (one params leaf) — a tree-parameter signature pays ~1.2 us
per leaf on the tunneled runtime and round 2's fwd number was inflated by
exactly that confound. Both median and best of 5 windows are reported; the
headline `value` uses the MEDIAN (the pooled tile has ~1.5-2x contention
spread; best-of is kept as `best_agg_per_s` for cross-round continuity).

vs_baseline: the reference publishes no in-repo numbers (BASELINE.md);
the ratio is against this repo's recorded round-1 number (BENCH_BASE below)
so progress across rounds is visible. Round 1 recorded best-of-3; the
median-based value makes vs_baseline conservative.

--compute-dtype bfloat16 benches the bf16 mixed-precision mode (bf16 layer
compute + bf16 Pallas streams, fp32 accumulation/masters) for the A/B
record; the flagship headline stays fp32 (reference-parity numerics).
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

BENCH_BASE = 2.8e7  # trip+quads/s through the TRAIN STEP, round 1, TPU v5e (best-of-3 windows; pooled tile has ~2x session variance)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(cfg, kind: str):
    """(device batch, n_real_rows, graph, dims, description)."""
    import dataclasses

    import jax.numpy as jnp

    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule
    from gemnet_pytorch_tpu.ops.pallas.segment_outer import _choose_blocks

    rng = np.random.default_rng(0)
    if kind == "small":
        # batch of 32 molecules, 8-12 atoms (COLL-like sizes)
        mols = [random_molecule(rng, int(rng.integers(8, 13))) for _ in range(32)]
    else:  # large: few big systems -> quad/kmax-heavy graph
        mols = [random_molecule(rng, 32) for _ in range(4)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=False)
    base = PadDims(n_mol=len(mols), n_atoms=16, n_edges=128, n_triplets=512,
                   kmax3=4, n_int_edges=64, n_intm=512, n_quads=512, kmax4=4)
    dims = base.grow_to(_scale_graph_dims(g, 1.05), len(mols), len(Z))
    # host-chosen Pallas W from REAL densities (the production provider path)
    dims = dataclasses.replace(
        dims,
        seg_block3=_choose_blocks(g.n_triplets, g.n_edges)[0],
        seg_block4=_choose_blocks(g.n_quads, g.n_edges)[0],
    )
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E_t = np.array([e for e, _ in EF], np.float32)
    F_t = np.concatenate([f for _, f in EF])
    batch_np = pad_batch(g, Z, R, dims, E=E_t, F=F_t, triplets_only=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    n_real = g.n_triplets + g.n_quads
    desc = (f"{g.n_edges} edges, {g.n_triplets} triplets, {g.n_quads} quads "
            f"(padded {dims.n_triplets}/{dims.n_quads}, kmax4={dims.kmax4}, "
            f"W3={dims.seg_block3}, W4={dims.seg_block4})")
    return batch, n_real, g, dims, batch_np, desc


def timed_windows(fn, iters=10, windows=5):
    """(best, median) seconds/iter over `windows` timing windows — the shared
    TPU pool has ~1.5-2x contention noise; median is the headline, best is
    kept for cross-round continuity."""
    import jax

    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return min(times), statistics.median(times)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of the steady-state "
                    "small-workload train steps to this directory")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="override config.yaml compute dtype (bf16 A/B)")
    ap.add_argument("--skip-large", action="store_true",
                    help="only the small headline workload")
    ap.add_argument("--skip-roofline", action="store_true",
                    help="skip peak calibration + cost analysis")
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="also time a lax.scan of K steps per dispatch "
                    "(trainer.multi_step_fn); >1 enables the extra window")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig, load_yaml_config
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.training import Trainer

    cfg_dict = load_yaml_config("config.yaml")
    if args.compute_dtype:
        cfg_dict["compute_dtype"] = args.compute_dtype
    cfg = ModelConfig.from_dict(cfg_dict)  # canonical: direct_forces=False
    tcfg = TrainConfig.from_dict(cfg_dict)
    log("devices:", jax.devices(), " compute_dtype:", cfg.compute_dtype)

    on_tpu = jax.default_backend() not in ("cpu",)
    peaks = None
    if not args.skip_roofline:
        from gemnet_pytorch_tpu.perf.roofline import DEFAULT_PEAKS, calibrate_peaks

        if on_tpu:
            t0 = time.perf_counter()
            peaks = calibrate_peaks()
            log(f"calibrated peaks in {time.perf_counter()-t0:.1f}s: "
                f"bf16 {peaks['mxu_bf16']/1e12:.1f} TF/s, "
                f"f32-HIGHEST {peaks['mxu_f32_highest']/1e12:.1f} TF/s, "
                f"HBM {peaks['hbm']/1e9:.0f} GB/s")
        else:
            peaks = dict(DEFAULT_PEAKS)
            log("CPU backend: using datasheet peak anchors for the roofline")

    model = make_model(cfg)
    lr = jnp.asarray(1.0, jnp.float32)
    results = {}
    roof = {}

    for kind in (("small",) if args.skip_large else ("small", "large")):
        batch, n_real, g, dims, batch_np, desc = make_batch(cfg, kind)
        log(f"[{kind}] batch: {desc}")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        trainer = Trainer(model, tcfg)
        state = trainer.init_state(dict(variables))
        packed = jnp.asarray(trainer.packer.pack(batch_np))

        if kind == "small":
            # forward with the SAME flat-params + packed-batch signature as
            # the train step (tree signatures pay per-leaf dispatch overhead
            # on the tunneled runtime — round 2's fwd/train contradiction)
            @jax.jit
            def forward(flat, scales, packed):
                b = trainer.packer.unpack(packed)
                params = trainer.unravel(flat)
                vs = {"params": params}
                if scales:
                    vs["scale_factors"] = scales
                E, F, _ = energy_and_forces(model, vs, b)
                return E, F

            t0 = time.perf_counter()
            E, F = forward(state.params, state.scales, packed)
            jax.block_until_ready(E)
            log(f"[{kind}] fwd compile+first run: {time.perf_counter() - t0:.1f}s")
            best, med = timed_windows(
                lambda: forward(state.params, state.scales, packed)[0], iters=20)
            log(f"[{kind}] fwd steady: median {med*1e3:.2f} ms best {best*1e3:.2f} "
                f"ms -> {n_real/med:.3e} trip+quad/s")
            results["fwd_ms_median"] = med * 1e3

        # full training step (loss incl. -dE/dR forces, double backward, optimizer)
        step = trainer.train_step_fn()
        t0 = time.perf_counter()
        state, metrics, _ = step(state, packed, lr)
        jax.block_until_ready(metrics["loss"])
        log(f"[{kind}] train compile+first step: {time.perf_counter() - t0:.1f}s")

        def train_once():
            nonlocal state
            state, metrics, _ = step(state, packed, lr)
            return metrics["loss"]

        best, med = timed_windows(train_once, iters=10)
        results[kind] = n_real / med
        results[kind + "_best"] = n_real / best
        results[kind + "_n_real"] = n_real
        log(f"[{kind}] train steady: median {med*1e3:.2f} ms best "
            f"{best*1e3:.2f} ms -> {n_real/med:.3e} trip+quad/s (median)")

        if not args.skip_roofline:
            from gemnet_pytorch_tpu.perf.roofline import (
                kernel_census, pallas_costs, speed_of_light, xla_costs,
            )

            census = kernel_census(step, state, packed, lr)
            compiled = step.lower(state, packed, lr).compile()
            real_rows = {dims.n_triplets: g.n_triplets,
                         dims.n_quads: g.n_quads,
                         dims.n_intm: g.n_intm}
            used_segs = {dims.n_edges: g.n_edges,
                         dims.n_int_edges: g.n_int_edges}
            rl = speed_of_light(
                xla_costs(compiled), pallas_costs(census, real_rows, used_segs),
                peaks,
            )
            rep = rl.report(med)
            ws = sorted({(c["kind"], c["W"], c["n"]) for c in census})
            log(f"[{kind}] pallas census: {len(census)} calls, W per (kind, "
                f"rows): {ws}")
            log(f"[{kind}] roofline: SOL {rep['sol_ms_lo']:.2f}-"
                f"{rep['sol_ms_hi']:.2f} ms vs measured {rep['measured_ms']:.2f} "
                f"ms | SOL-fraction {rep['sol_fraction']:.2f} | MFU(bf16peak) "
                f"{rep['mfu_bf16peak']*100:.1f}% | HBM util "
                f"{rep['hbm_util']*100:.1f}%")
            if rep["below_floor"] and on_tpu:
                log(f"[{kind}] ERROR: measured step time {rep['measured_ms']:.2f}"
                    f" ms is BELOW the physical model floor "
                    f"{rep['sol_ms_lo']:.2f} ms — measurement artifact; do NOT "
                    "trust this number")
            roof[kind] = {k: v for k, v in rep.items() if k != "census"}

        # optional: K steps per dispatch via lax.scan over stacked packed
        # batches (trainer.multi_step_fn; numerically identical to single
        # steps — tests/test_flat_opt.py). Opt-in: the scanned program is
        # ~Kx bigger, and the pooled tunneled runtime intermittently enters
        # a mode where every execution re-uploads the program binary
        # (~60-90 MB/s), which punishes big programs size-proportionally
        # (artifacts_r02_profile.md "degraded-pool mode").
        K = args.steps_per_call
        if K > 1:
            row = trainer.packer.pack(batch_np)
            packed_k = jnp.asarray(np.stack([row] * K))
            multi = trainer.multi_step_fn()
            t0 = time.perf_counter()
            state, metrics, _ = multi(state, packed_k, lr)
            jax.block_until_ready(metrics["loss"])
            log(f"[{kind}] scan{K} compile+first call: "
                f"{time.perf_counter() - t0:.1f}s")

            def train_scan():
                nonlocal state
                state, m, _ = multi(state, packed_k, lr)
                return m["loss"]

            b_s, m_s = timed_windows(train_scan, iters=3, windows=3)
            results[kind + "_scan"] = n_real / (m_s / K)
            log(f"[{kind}] train scan{K} steady: median {m_s/K*1e3:.2f} ms/step"
                f" -> {n_real/(m_s/K):.3e} trip+quad/s")
        else:
            multi = packed_k = None

        if kind == "small" and args.profile:
            # after the timed window: in-process tracing costs ~10x on the
            # tunneled runtime and must not skew the reported metric
            jax.profiler.start_trace(args.profile)
            for _ in range(5):
                train_once()
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            log(f"profiler trace written to {args.profile}")

        # free the trainer's compiled step before the next (bigger) workload
        del trainer, state, step, variables, multi, packed_k

    out = {
        "metric": "triplets+quads aggregated/sec/chip (GemNet-Q train step)",
        "small_n_real": results.get("small_n_real"),
        "large_n_real": results.get("large_n_real"),
        "value": results["small"],
        "unit": "agg/s/chip",
        "vs_baseline": results["small"] / BENCH_BASE,
        "best_agg_per_s": results["small_best"],
        "fwd_ms_median": results.get("fwd_ms_median"),
        "note": "value = MEDIAN of 5 windows (round-1 base was best-of-3; "
                "pooled tile, ~1.5-2x session spread)",
    }
    if "small" in roof:
        r = roof["small"]
        out.update(
            sol_ms_lo=r["sol_ms_lo"], sol_ms_hi=r["sol_ms_hi"],
            sol_fraction=r["sol_fraction"], mfu_bf16peak=r["mfu_bf16peak"],
            hbm_util=r["hbm_util"], below_floor=r["below_floor"],
        )
        if peaks:
            out["peaks"] = {k: float(v) for k, v in peaks.items()}
    if "small_scan" in results:
        out["steps_per_call"] = args.steps_per_call
        out["scan_agg_per_s"] = results["small_scan"]
    if "large" in results:
        out["large_agg_per_s"] = results["large"]
        if "large" in roof:
            out["large_sol_fraction"] = roof["large"]["sol_fraction"]
            out["large_below_floor"] = roof["large"]["below_floor"]
        if "large_scan" in results:
            out["large_scan_agg_per_s"] = results["large_scan"]
    if cfg.compute_dtype != "float32":
        out["compute_dtype"] = cfg.compute_dtype
    print(json.dumps(out))


if __name__ == "__main__":
    main()
