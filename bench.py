#!/usr/bin/env python
"""Benchmark: triplet+quadruplet aggregation throughput per chip.

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

Inference forward throughput is logged to stderr. Prints ONE JSON line on
stdout.

vs_baseline: the reference publishes no in-repo numbers (BASELINE.md);
the ratio is against this repo's recorded round-1 number (BENCH_BASE below)
so progress across rounds is visible.

--compute-dtype bfloat16 benches the bf16 mixed-precision mode (bf16 layer
compute + bf16 Pallas streams, fp32 accumulation/masters) for the A/B
record; the flagship headline stays fp32 (reference-parity numerics).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BENCH_BASE = 2.8e7  # trip+quads/s through the TRAIN STEP, round 1, TPU v5e (best-of-3 windows; pooled tile has ~2x session variance)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(cfg, kind: str):
    """(device batch, n_real_rows, description) for a bench workload."""
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule

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
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E_t = np.array([e for e, _ in EF], np.float32)
    F_t = np.concatenate([f for _, f in EF])
    batch_np = pad_batch(g, Z, R, dims, E=E_t, F=F_t, triplets_only=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    n_real = g.n_triplets + g.n_quads
    desc = (f"{g.n_edges} edges, {g.n_triplets} triplets, {g.n_quads} quads "
            f"(padded {dims.n_triplets}/{dims.n_quads}, kmax4={dims.kmax4})")
    return batch, n_real, desc


def best_window(fn, iters=10, windows=3):
    """min over windows — the shared TPU pool has ~2x contention noise."""
    import jax

    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


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

    model = make_model(cfg)
    lr = jnp.asarray(1.0, jnp.float32)
    results = {}

    for kind in (("small",) if args.skip_large else ("small", "large")):
        batch, n_real, desc = make_batch(cfg, kind)
        log(f"[{kind}] batch: {desc}")
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

        if kind == "small":
            @jax.jit
            def forward(variables, batch):
                E, F, _ = energy_and_forces(model, variables, batch)
                return E, F

            t0 = time.perf_counter()
            E, F = forward(variables, batch)
            jax.block_until_ready(E)
            log(f"[{kind}] fwd compile+first run: {time.perf_counter() - t0:.1f}s")
            dt = best_window(lambda: forward(variables, batch)[0], iters=20)
            log(f"[{kind}] fwd steady: {dt*1e3:.2f} ms/batch -> "
                f"{n_real/dt:.3e} trip+quad/s")

        # full training step (loss incl. -dE/dR forces, double backward, optimizer)
        trainer = Trainer(model, tcfg)
        state = trainer.init_state(dict(variables))
        step = trainer.train_step_fn()
        t0 = time.perf_counter()
        state, metrics, _ = step(state, batch, lr)
        jax.block_until_ready(metrics["loss"])
        log(f"[{kind}] train compile+first step: {time.perf_counter() - t0:.1f}s")

        def train_once():
            nonlocal state
            state, metrics, _ = step(state, batch, lr)
            return metrics["loss"]

        dt = best_window(train_once, iters=10)
        results[kind] = n_real / dt
        log(f"[{kind}] train steady (best of 3 windows): {dt*1e3:.2f} ms/step "
            f"-> {n_real/dt:.3e} trip+quad/s")

        # optional: K steps per dispatch via lax.scan over stacked packed
        # batches (trainer.multi_step_fn; numerically identical to single
        # steps — tests/test_flat_opt.py). Opt-in: the scanned program is
        # ~Kx bigger, and the pooled tunneled runtime intermittently enters
        # a mode where every execution re-uploads the program binary
        # (~60-90 MB/s), which punishes big programs size-proportionally
        # (artifacts_r02_profile.md "degraded-pool mode").
        K = args.steps_per_call
        if K > 1:
            row = trainer.packer.pack(
                {k: np.asarray(v) for k, v in batch.items()})
            packed = jnp.asarray(np.stack([row] * K))
            multi = trainer.multi_step_fn()
            t0 = time.perf_counter()
            state, metrics, _ = multi(state, packed, lr)
            jax.block_until_ready(metrics["loss"])
            log(f"[{kind}] scan{K} compile+first call: "
                f"{time.perf_counter() - t0:.1f}s")

            def train_scan():
                nonlocal state
                state, m, _ = multi(state, packed, lr)
                return m["loss"]

            dt_scan = best_window(train_scan, iters=3) / K
            results[kind + "_scan"] = n_real / dt_scan
            log(f"[{kind}] train scan{K} steady (best of 3 windows): "
                f"{dt_scan*1e3:.2f} ms/step -> {n_real/dt_scan:.3e} trip+quad/s")
        else:
            multi = packed = None

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
        del trainer, state, step, variables, multi, packed

    out = {
        "metric": "triplets+quads aggregated/sec/chip (GemNet-Q train step)",
        "value": results["small"],
        "unit": "agg/s/chip",
        "vs_baseline": results["small"] / BENCH_BASE,
    }
    if "small_scan" in results:
        out["steps_per_call"] = args.steps_per_call
        out["scan_agg_per_s"] = results["small_scan"]
    if "large" in results:
        out["large_agg_per_s"] = results["large"]
        if "large_scan" in results:
            out["large_scan_agg_per_s"] = results["large_scan"]
    if cfg.compute_dtype != "float32":
        out["compute_dtype"] = cfg.compute_dtype
    print(json.dumps(out))


if __name__ == "__main__":
    main()
