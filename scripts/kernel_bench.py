#!/usr/bin/env python
"""Microbenchmark the Pallas segment kernels in isolation (TPU).

The round-4 trace shows the 48 segment-kernel calls are 50% of the train
step (~1.5-1.8 ms per quad-space call) while their analytic SOL is ~0.2 ms —
this script isolates ONE kernel call at the bench quad/trip shapes and
sweeps the tunables so the gap can be attributed (per-grid-step overhead vs
DMA vs MXU passes vs VPU one-hot work):

  - W (segment-block width): MXU amplification vs grid length
  - stream dtype: fp32 (HIGHEST, 6-pass) vs bf16 (DEFAULT, 1-pass)
  - direction: fwd (segment_outer_sum) vs bwd (segment_gather_contract)

Timing: chained value-fetch windows (perf/timing) — each iteration feeds
the previous output's first element back into the stream so calls serialize.

Run: python scripts/kernel_bench.py [--space quad|trip|both]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench_shape(name, n, S, M, n_segments, rows_real, seg_blocks, windows=3,
                iters=8):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.pallas import segment_outer as so
    from gemnet_pytorch_tpu.perf.timing import fetch_scalar

    rng = np.random.default_rng(0)
    # sorted, realistically-distributed segment ids over the REAL rows;
    # padded tail carries the padded-id convention
    ids_real = np.sort(rng.integers(0, int(n_segments * 0.95), rows_real))
    ids = np.concatenate(
        [ids_real, np.full(n - rows_real, n_segments - 1)]
    ).astype(np.int32)
    a = rng.standard_normal((n, S), np.float32)
    b = rng.standard_normal((n, M), np.float32)
    cot = rng.standard_normal((S, n_segments, M), np.float32)
    splits = np.zeros(1, np.int32)  # row_splits unused by the kernels

    print(f"\n# {name}: n={n} S={S} M={M} nseg={n_segments} "
          f"(real rows {rows_real})", file=sys.stderr)

    # K kernel calls inside ONE jitted program (lax.scan with a data
    # dependence through the b-stream): per-call dispatch on the tunneled
    # runtime is ~2-7 ms — a per-dispatch chain would measure only that
    # (the first version of this script did exactly that). The b-side
    # restaging inside the loop adds ~0.1 ms of loop-variant transpose
    # traffic, identical across variants.
    K = 16

    for dtype_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        aj = jnp.asarray(a, dt)
        bj = jnp.asarray(b, dt)
        cj = jnp.asarray(cot, jnp.float32 if dt == jnp.float32 else jnp.bfloat16)
        idsj = jnp.asarray(ids)
        spl = jnp.asarray(splits)
        for W in seg_blocks:
            if n_segments % W:
                continue

            @jax.jit
            def fwd_loop(a_, b_):
                def body(c, _):
                    out = so.segment_outer_sum(
                        a_, c, idsj, spl, n_segments, "pallas", W)
                    return c + out[0, 0, 0].astype(c.dtype) * 0, ()

                y, _ = jax.lax.scan(body, b_, None, length=K)
                return y[0, 0]

            @jax.jit
            def bwd_loop(c0, a_, b_):
                def body(c, _):
                    da, db = so.segment_gather_contract(
                        c, a_, b_, idsj, spl, "pallas", W)
                    return c + da[0, 0].astype(c.dtype) * 0, ()

                y, _ = jax.lax.scan(body, c0, None, length=K)
                return y[0, 0, 0]

            for tag, call, args in (
                ("fwd", fwd_loop, (aj, bj)),
                ("bwd", bwd_loop, (cj, aj, bj)),
            ):
                try:
                    fetch_scalar(call(*args))
                except Exception as e:
                    print(f"{dtype_name} W={W:3d} {tag}: FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}", file=sys.stderr)
                    continue
                best = float("inf")
                for _ in range(windows):
                    t0 = time.perf_counter()
                    fetch_scalar(call(*args))
                    best = min(best, (time.perf_counter() - t0) / K)
                extra = ""
                if tag == "fwd":
                    flops = 2.0 * S * W * M * n
                    extra = f" ({flops/best/1e12:5.1f} TF/s one-hot)"
                print(f"{dtype_name} W={W:3d} {tag}: {best*1e3:7.3f} ms{extra}",
                      file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--space", default="both", choices=["quad", "trip", "both"])
    args = ap.parse_args()

    import jax

    print("devices:", jax.devices(), file=sys.stderr)

    if args.space in ("quad", "both"):
        # bench small-workload quad shapes: 192512 rows, S=56 (49 padded),
        # M=32, 3072 int-edge segments (the (49,3072,32) output family)
        bench_shape("quad", 192512, 49, 32, 3072, 182904, (4, 8, 16, 32))
    if args.space in ("trip", "both"):
        bench_shape("trip", 25600, 16, 64, 3072, 23996, (4, 8, 16, 32))


if __name__ == "__main__":
    main()
