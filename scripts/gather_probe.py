#!/usr/bin/env python
"""Probe: can a Pallas kernel beat XLA's row gather on TPU?

XLA's `table[idx]` at bench quad shapes ((29184, 32) bf16 table, 192512
rows gathered) runs ~0.33 ms inside the train step — row-rate-bound. The
step carries ~16 such gathers/permutes (~5 ms/step). This probes Pallas
alternatives with Mosaic's dynamic-gather lowerings.

Timing: ONE dispatch running a lax.scan chain of K gathers (the tunnel's
per-dispatch overhead is ~2-7 ms, larger than the op itself).

Run (TPU): python scripts/gather_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemnet_pytorch_tpu.perf.timing import fetch_scalar

    print("devices:", jax.devices(), flush=True)
    N_TAB, M, R = 29184, 32, 192512
    RB = 512
    K = 32
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((N_TAB, M)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N_TAB, R).astype(np.int32))

    def bench(gather_fn, check=True):
        """gather_fn(table, idx) -> (R, M); scan-chain K applications."""
        if check:
            got = np.asarray(gather_fn(table, idx))
            np.testing.assert_array_equal(got, np.asarray(table[idx]))

        @jax.jit
        def chain(t, i):
            def body(c, _):
                o = gather_fn(t + c, i)
                return o.reshape(-1)[0] * 0, None

            c, _ = jax.lax.scan(body, jnp.zeros((), t.dtype), None, length=K)
            return c

        fetch_scalar(chain(table, idx).astype(jnp.float32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch_scalar(chain(table, idx).astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        return best / K * 1e3

    try:
        ms = bench(lambda t, i: t[i])
        print(f"xla gather        : {ms:.3f} ms "
              f"({R*M*2/ms*1e3/1e9:.1f} GB/s out)", flush=True)
    except Exception as e:
        print("xla gather failed:", repr(e).splitlines()[0][:200], flush=True)

    # ---- Pallas: VMEM table + per-chunk take_along_axis over sublanes ----
    def tal0_kernel(idx_ref, table_ref, out_ref):
        idx2 = jax.lax.broadcast_in_dim(
            idx_ref[0], (idx_ref.shape[1], table_ref.shape[1]), (0,))
        out_ref[...] = jnp.take_along_axis(table_ref[...], idx2, axis=0)

    def tal0(t, i):
        return pl.pallas_call(
            tal0_kernel,
            grid=(R // RB,),
            in_specs=[
                pl.BlockSpec((1, RB), lambda j: (0, j)),
                pl.BlockSpec((N_TAB, M), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((RB, M), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((R, M), t.dtype),
        )(i.reshape(1, -1), t)

    try:
        ms = bench(tal0)
        print(f"pallas tal axis0  : {ms:.3f} ms", flush=True)
    except Exception as e:
        print("pallas tal axis0 failed:", repr(e).splitlines()[0][:200],
              flush=True)

    # ---- Pallas: feature-major table (M, N) + take_along_axis over lanes ----
    def tal1_kernel(idx_ref, table_ref, out_ref):
        idx2 = jax.lax.broadcast_in_dim(
            idx_ref[0], (table_ref.shape[0], idx_ref.shape[1]), (1,))
        out_ref[...] = jnp.take_along_axis(table_ref[...], idx2, axis=1)

    def tal1(tT, i):
        return pl.pallas_call(
            tal1_kernel,
            grid=(R // RB,),
            in_specs=[
                pl.BlockSpec((1, RB), lambda j: (0, j)),
                pl.BlockSpec((M, N_TAB), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((M, RB), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((M, R), tT.dtype),
        )(i.reshape(1, -1), tT)

    tT = table.T.copy()
    try:
        got = np.asarray(tal1(tT, idx))
        np.testing.assert_array_equal(got, np.asarray(table[idx]).T)

        def fm(t, i):
            return tal1(t.T, i).T  # includes the transposes it would save

        ms = bench(lambda t, i: tal1(tT + t[0, 0] * 0, i), check=False)
        print(f"pallas tal axis1  : {ms:.3f} ms (feature-major in/out)",
              flush=True)
    except Exception as e:
        print("pallas tal axis1 failed:", repr(e).splitlines()[0][:200],
              flush=True)


if __name__ == "__main__":
    main()
