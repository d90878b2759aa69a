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

Measurement methodology (rebuilt for round 4 — VERDICT r3 item 1):
`jax.block_until_ready` returns early on the tunneled axon runtime, which
made every round-2/3 number physically impossible (below the roofline
floor). All timing now goes through perf/timing.timed_windows: chained
dispatches whose k+1-th call data-depends on the k-th (the train step
threads its state; the forward threads an explicit zero scalar), each
window ending with a host VALUE FETCH of a scalar — the host cannot hold
the value before the device computed the whole chain. Windows are sized
>= max(0.5 s, 100x the measured fetch RTT) so the single fetch is a
subtracted, bounded constant. Cross-instruments: --profile writes AND READS
BACK a jax.profiler trace (perf/trace.py device module times), and
train.py's long-run wall clock bounds the same step from above.

Roofline (gemnet_pytorch_tpu/perf/roofline.py): matmul/HBM peaks are
CALIBRATED in-process with the same value-fetch instruments and asserted
against the v5e datasheet (calibration that "beats" the datasheet by >1.25x
raises instead of recording garbage); the floor's memory term is
live-buffer bytes (state r+w, batch read) — a true lower bound — while
XLA's post-fusion 'bytes accessed' accounting only feeds the upper bound.
A measured time below the floor flags the run ("below_floor": true) as a
measurement artifact instead of being reported as a win. The Pallas kernel
census must be non-empty whenever the Pallas path is active (round 3
recorded 0 calls silently).

vs_baseline: the reference publishes no in-repo numbers (BASELINE.md);
the ratio is against this repo's ROUND-4 recorded numbers (BENCH_BASE_*
below) — the first honest measurements in the repo's history
(artifacts_r04_perf.md reconciles rounds 1-3, which all flowed through a
broken barrier; the old round-1 anchor 2.8e7 was a fiction and dividing by
it made vs_baseline meaningless — VERDICT r4 item 5). Round-over-round
convention from round 5 on: vs_baseline = this run's headline / the
previous round's recorded headline in the SAME compute dtype.

Headline path: bfloat16 streams (the TPU-native production mode, round-4
A/B-parity-tested) — VERDICT r4 item 1c. The fp32 reference-parity mode is
measured in its own consecutive window block ("f32_agg_per_s") on both
workloads so the A/B and the round-4 continuity are always recorded;
--compute-dtype float32 restores the old fp32 headline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Round-4 honest anchors (BENCH_r04.json, value-fetch windows, TPU v5e):
BENCH_BASE_BF16 = 4311535.0  # bf16 small train step, 47.99 ms/step
BENCH_BASE_F32 = 2316200.0   # fp32 small train step, 89.33 ms/step


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


def measure_train_step(trainer, state, packed, lr, rtt, tag):
    """Steady-state seconds/step of the jitted train step via chained
    value-fetch windows. Returns (final_state, timing dict)."""
    from gemnet_pytorch_tpu.perf.timing import fetch_scalar, timed_windows

    step = trainer.train_step_fn()
    t0 = time.perf_counter()
    state, metrics, _ = step(state, packed, lr)
    fetch_scalar(metrics["loss"])
    log(f"[{tag}] train compile+first step: {time.perf_counter() - t0:.1f}s")

    box = {"state": state}

    def train_once():
        box["state"], m, _ = step(box["state"], packed, lr)
        return m["loss"]

    res = timed_windows(train_once, rtt_s=rtt)
    log(f"[{tag}] train steady: median {res['median_s']*1e3:.3f} ms best "
        f"{res['best_s']*1e3:.3f} ms ({res['iters']} chained steps/window, "
        f"rtt {res['rtt_s']*1e3:.1f} ms)")
    return box["state"], res


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace of the steady-state "
                    "small-workload train steps to this directory AND read "
                    "back the per-step device time (perf/trace.py)")
    ap.add_argument("--compute-dtype", default=None,
                    choices=["float32", "bfloat16"],
                    help="HEADLINE compute dtype (default bfloat16, the "
                    "TPU-native production mode; float32 restores the "
                    "pre-round-5 reference-parity headline)")
    ap.add_argument("--skip-large", action="store_true",
                    help="only the small headline workload")
    ap.add_argument("--skip-f32", action="store_true",
                    help="skip the fp32 reference-parity A/B windows")
    ap.add_argument("--large-scan", type=int, default=4,
                    help="K for the large-workload scan-of-K adjudicator "
                    "window (amortizes any per-dispatch cost Kx: separates "
                    "device time from tunnel/re-upload overhead; 0 disables)")
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
    from gemnet_pytorch_tpu.perf.timing import fetch_scalar, measure_rtt, timed_windows
    from gemnet_pytorch_tpu.training import Trainer

    cfg_dict = load_yaml_config("config.yaml")
    cfg_dict["compute_dtype"] = args.compute_dtype or "bfloat16"
    cfg = ModelConfig.from_dict(cfg_dict)  # canonical: direct_forces=False
    tcfg = TrainConfig.from_dict(cfg_dict)
    log("devices:", jax.devices(), " compute_dtype:", cfg.compute_dtype)

    on_tpu = jax.default_backend() not in ("cpu",)
    rtt = measure_rtt()
    log(f"host<->device scalar-fetch RTT: {rtt*1e3:.2f} ms")

    peaks = None
    peaks_source = "skipped"
    if not args.skip_roofline:
        from gemnet_pytorch_tpu.perf.roofline import (
            DEFAULT_PEAKS, CalibrationError, calibrate_peaks,
        )

        if on_tpu:
            t0 = time.perf_counter()
            try:
                peaks = calibrate_peaks(strict=True)
                peaks_source = "calibrated"
            except CalibrationError as e:
                log(f"PEAK CALIBRATION FAILED ({e}); falling back to v5e "
                    "datasheet anchors — derived MFU/SOL use datasheet peaks")
                peaks = dict(DEFAULT_PEAKS)
                peaks_source = f"datasheet-fallback({e})"
            log(f"peaks ({peaks_source}) in {time.perf_counter()-t0:.1f}s: "
                f"bf16 {peaks['mxu_bf16']/1e12:.1f} TF/s, "
                f"f32-HIGHEST {peaks['mxu_f32_highest']/1e12:.1f} TF/s, "
                f"HBM {peaks['hbm']/1e9:.0f} GB/s")
        else:
            peaks = dict(DEFAULT_PEAKS)
            peaks_source = "datasheet(cpu-backend)"
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
            # on the tunneled runtime — round 2's fwd/train contradiction).
            # `eps` (always 0) chains call k+1 onto call k's output so the
            # window's final value fetch covers every dispatched forward.
            @jax.jit
            def forward(flat, scales, packed, eps):
                b = trainer.packer.unpack(packed)
                params = trainer.unravel(flat + eps)
                vs = {"params": params}
                if scales:
                    vs["scale_factors"] = scales
                E, F, _ = energy_and_forces(model, vs, b)
                return E, F, jnp.sum(E) * 0.0

            t0 = time.perf_counter()
            zero = jnp.zeros((), jnp.float32)
            E, F, chain = forward(state.params, state.scales, packed, zero)
            fetch_scalar(chain)
            log(f"[{kind}] fwd compile+first run: {time.perf_counter() - t0:.1f}s")
            box = {"eps": zero}

            def fwd_once():
                _, _, box["eps"] = forward(
                    state.params, state.scales, packed, box["eps"])
                return box["eps"]

            fres = timed_windows(fwd_once, rtt_s=rtt)
            log(f"[{kind}] fwd steady: median {fres['median_s']*1e3:.3f} ms "
                f"best {fres['best_s']*1e3:.3f} ms "
                f"({fres['iters']} chained/window) "
                f"-> {n_real/fres['median_s']:.3e} trip+quad/s")
            results["fwd_ms_median"] = fres["median_s"] * 1e3

        # full training step (loss incl. -dE/dR forces, double backward,
        # optimizer) — chained through state, value-fetch barrier per window
        state, tres = measure_train_step(trainer, state, packed, lr, rtt, kind)
        med = tres["median_s"]
        results[kind] = n_real / med
        results[kind + "_best"] = n_real / tres["best_s"]
        results[kind + "_n_real"] = n_real
        results[kind + "_ms"] = med * 1e3
        log(f"[{kind}] -> {n_real/med:.3e} trip+quad/s (median)")

        if not args.skip_roofline:
            from gemnet_pytorch_tpu.perf.roofline import (
                kernel_census, pallas_costs, speed_of_light,
                train_step_min_bytes, xla_costs,
            )

            step = trainer.train_step_fn()
            census = kernel_census(step, state, packed, lr)
            if on_tpu:
                # the Pallas path is active on TPU ('auto' routing); a silent
                # empty census voided round 3's floor — fail loudly instead
                assert census, (
                    "Pallas kernel census is EMPTY on the TPU path — the "
                    "roofline floor would silently omit all segment-kernel "
                    "FLOPs (VERDICT r3 item 3)")
            compiled = step.lower(state, packed, lr).compile()
            try:
                ma = compiled.memory_analysis()
                code_mb = ma.generated_code_size_in_bytes / 1e6
                results[kind + "_code_mb"] = code_mb
                log(f"[{kind}] compiled code size: {code_mb:.1f} MB, "
                    f"temp {ma.temp_size_in_bytes/1e6:.1f} MB, argument "
                    f"{ma.argument_size_in_bytes/1e6:.1f} MB")
            except Exception as e:
                log(f"memory_analysis unavailable: {e!r}")
            real_rows = {dims.n_triplets: g.n_triplets,
                         dims.n_quads: g.n_quads,
                         dims.n_intm: g.n_intm}
            used_segs = {dims.n_edges: g.n_edges,
                         dims.n_int_edges: g.n_int_edges}
            rl = speed_of_light(
                xla_costs(compiled), pallas_costs(census, real_rows, used_segs),
                peaks, min_bytes=train_step_min_bytes(state, packed),
            )
            rep = rl.report(med)
            ws = sorted({(c["kind"], c["W"], c["n"]) for c in census})
            log(f"[{kind}] pallas census: {len(census)} calls, W per (kind, "
                f"rows): {ws}")
            log(f"[{kind}] roofline: SOL {rep['sol_ms_lo']:.3f}-"
                f"{rep['sol_ms_hi']:.3f} ms vs measured {rep['measured_ms']:.3f} "
                f"ms | SOL-fraction {rep['sol_fraction']:.2f} | MFU(bf16peak) "
                f"{rep['mfu_bf16peak']*100:.1f}% | HBM util lo "
                f"{rep['hbm_util_lo']*100:.1f}% (accounting-hi "
                f"{rep['hbm_util']*100:.1f}%)")
            if rep["below_floor"] and on_tpu:
                log(f"[{kind}] ERROR: measured step time {rep['measured_ms']:.3f}"
                    f" ms is BELOW the physical model floor "
                    f"{rep['sol_ms_lo']:.3f} ms — measurement artifact; do NOT "
                    "trust this number")
            roof[kind] = {k: v for k, v in rep.items() if k != "census"}

        # K steps per dispatch via lax.scan over stacked packed batches
        # (trainer.multi_step_fn; numerically identical to single steps —
        # tests/test_flat_opt.py). Always on for the LARGE workload
        # (--large-scan, default 4): scan amortizes EVERY per-dispatch cost
        # Kx — including any program re-upload — so scanK-per-step vs the
        # single-step window adjudicates whether the large number is device
        # time or tunnel pathology (VERDICT r4 item 2).
        K = args.steps_per_call
        if kind == "large" and args.large_scan > 1:
            K = max(K, args.large_scan)
        if K > 1:
            row = trainer.packer.pack(batch_np)
            packed_k = jnp.asarray(np.stack([row] * K))
            multi = trainer.multi_step_fn()
            t0 = time.perf_counter()
            state, metrics, _ = multi(state, packed_k, lr)
            fetch_scalar(metrics["loss"])
            log(f"[{kind}] scan{K} compile+first call: "
                f"{time.perf_counter() - t0:.1f}s")
            sbox = {"state": state}

            def train_scan():
                sbox["state"], m, _ = multi(sbox["state"], packed_k, lr)
                return m["loss"]

            sres = timed_windows(train_scan, windows=3, rtt_s=rtt)
            state = sbox["state"]
            scan_ms = sres["median_s"] / K * 1e3
            results[kind + "_scan"] = n_real / (sres["median_s"] / K)
            results[kind + "_scan_ms"] = scan_ms
            log(f"[{kind}] train scan{K} steady: {scan_ms:.3f} ms/step"
                f" -> {n_real/(sres['median_s']/K):.3e} trip+quad/s")
            if kind == "large":
                single_ms = results["large_ms"]
                overhead = single_ms - scan_ms
                verdict = (
                    "DEVICE-BOUND (scan-of-K matches single steps; no "
                    "re-upload pathology)" if overhead < 0.1 * single_ms
                    else f"PER-DISPATCH OVERHEAD ~{overhead:.0f} ms/step "
                    "(tunnel/re-upload; device time is the scan number)"
                )
                results["large_dispatch_overhead_ms"] = overhead
                log(f"[large] adjudication: single {single_ms:.1f} ms vs "
                    f"scan{K} {scan_ms:.1f} ms/step -> {verdict}")
        else:
            multi = packed_k = None

        if kind == "small" and args.profile:
            # after the timed window: in-process tracing costs extra on the
            # tunneled runtime and must not skew the reported metric
            step = trainer.train_step_fn()
            jax.profiler.start_trace(args.profile)
            st, m = state, None
            for _ in range(10):
                st, m, _ = step(st, packed, lr)
            fetch_scalar(m["loss"])
            jax.profiler.stop_trace()
            log(f"profiler trace written to {args.profile}")
            try:
                from gemnet_pytorch_tpu.perf.trace import (
                    step_device_ms, summarize,
                )

                log("trace device-module summary:\n" + summarize(args.profile))
                mt = step_device_ms(args.profile, match="step")
                if mt is not None:
                    results["profile_step_ms"] = mt.mean_ms
                    log(f"profiler DEVICE step time: {mt.mean_ms:.3f} ms "
                        f"({mt.count} execs of {mt.name})")
                else:
                    log("WARNING: no 'step' module events in trace")
            except Exception as e:  # parsing must never kill the bench
                log(f"trace readback failed: {e!r}")

        # free the trainer's compiled step before the next (bigger) workload
        step = None
        del trainer, state, step, variables, multi, packed_k

    # ---- fp32 reference-parity A/B (own consecutive window block — program
    # switches on the tunneled runtime cost ~0.5-1.2 s and must not
    # interleave). Records the round-4 continuity numbers on BOTH workloads
    # (the large fp32 window was the round-4 gap — VERDICT r4 item 2). ----
    if not args.skip_f32 and cfg.compute_dtype == "bfloat16":
        f32_cfg = ModelConfig.from_dict(
            dict(cfg_dict, compute_dtype="float32"))
        f32_model = make_model(f32_cfg)
        for kind in (("small",) if args.skip_large else ("small", "large")):
            batch, n_real, g, dims, batch_np, _ = make_batch(f32_cfg, kind)
            variables = jax.jit(f32_model.init)(jax.random.PRNGKey(0), batch)
            trainer = Trainer(f32_model, tcfg)
            state = trainer.init_state(dict(variables))
            packed = jnp.asarray(trainer.packer.pack(batch_np))
            state, bres = measure_train_step(
                trainer, state, packed, lr, rtt, kind + "/f32")
            results[f"f32_{kind}_agg"] = n_real / bres["median_s"]
            results[f"f32_{kind}_ms"] = bres["median_s"] * 1e3
            log(f"[{kind}/f32] -> {results[f'f32_{kind}_agg']:.3e} "
                f"trip+quad/s (headline {cfg.compute_dtype}: "
                f"{results.get(kind, 0):.3e})")
            del trainer, state, variables

    base = (BENCH_BASE_BF16 if cfg.compute_dtype == "bfloat16"
            else BENCH_BASE_F32)
    out = {
        "metric": "triplets+quads aggregated/sec/chip (GemNet-Q train step)",
        "compute_dtype": cfg.compute_dtype,
        "small_n_real": results.get("small_n_real"),
        "large_n_real": results.get("large_n_real"),
        "value": results["small"],
        "unit": "agg/s/chip",
        "vs_baseline": results["small"] / base,
        "best_agg_per_s": results["small_best"],
        "small_ms_median": results.get("small_ms"),
        "fwd_ms_median": results.get("fwd_ms_median"),
        "rtt_ms": rtt * 1e3,
        "peaks_source": peaks_source,
        "note": "value = MEDIAN of 5 chained value-fetch windows, "
                f"{cfg.compute_dtype} headline; vs_baseline is measured/"
                "measured vs the round-4 anchor in the same dtype "
                "(artifacts_r04_perf.md; re-anchored per VERDICT r4 item 5)",
    }
    if "small" in roof:
        r = roof["small"]
        out.update(
            sol_ms_lo=r["sol_ms_lo"], sol_ms_hi=r["sol_ms_hi"],
            sol_band=r.get("sol_band"),
            sol_fraction=r["sol_fraction"], mfu_bf16peak=r["mfu_bf16peak"],
            hbm_util=r["hbm_util"], hbm_util_lo=r["hbm_util_lo"],
            below_floor=r["below_floor"], pallas_calls=r["pallas_calls"],
        )
        if peaks:
            out["peaks"] = {k: float(v) for k, v in peaks.items()}
    if "profile_step_ms" in results:
        out["profile_step_ms"] = results["profile_step_ms"]
    if "small_code_mb" in results:
        out["code_size_mb"] = results["small_code_mb"]
    for k in ("f32_small_agg", "f32_small_ms", "f32_large_agg",
              "f32_large_ms"):
        if k in results:
            out[k] = results[k]
    if "f32_small_agg" in results:
        out["f32_vs_r04"] = results["f32_small_agg"] / BENCH_BASE_F32
    if "small_scan" in results:
        out["steps_per_call"] = args.steps_per_call
        out["scan_agg_per_s"] = results["small_scan"]
    if "large" in results:
        out["large_agg_per_s"] = results["large"]
        out["large_ms_median"] = results.get("large_ms")
        if "large" in roof:
            out["large_sol_fraction"] = roof["large"]["sol_fraction"]
            out["large_below_floor"] = roof["large"]["below_floor"]
            out["large_sol_band"] = roof["large"].get("sol_band")
        for k in ("large_scan_ms", "large_dispatch_overhead_ms"):
            if k in results:
                out[k] = results[k]
        if "large_scan" in results:
            out["large_scan_agg_per_s"] = results["large_scan"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
