#!/usr/bin/env python
"""Probe: can a Pallas kernel beat XLA's row gather on TPU?

XLA's `table[idx]` at bench quad shapes ((29184|192512, 32) bf16 tables,
192512 rows gathered) runs ~0.33 ms — ~37 GB/s effective, row-rate-bound
(~583 M rows/s), 10x off the HBM stream rate. The train step carries ~16
such gathers/permutes (~5 ms/step). This probes Pallas alternatives:

  xla       : table[idx] (baseline)
  vmem_take : grid over row chunks; table resident in VMEM; per chunk
              out = jnp.take(table, idx_chunk, axis=0) (Mosaic dynamic
              gather, if it lowers)
  onehot    : per chunk one-hot (band) matmul — only valid for SORTED idx
              with a narrow band per chunk; probed on a sorted permutation

Run (TPU): python scripts/gather_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gemnet_pytorch_tpu.perf.timing import fetch_scalar

    print("devices:", jax.devices(), flush=True)
    N_TAB, M, R = 29184, 32, 192512
    RB = 512
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((N_TAB, M)).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N_TAB, R).astype(np.int32))

    def timeit(f, *args, iters=30):
        out = f(*args)
        fetch_scalar(out.astype(jnp.float32).sum() * 0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chain = jnp.zeros((), jnp.bfloat16)
            for _ in range(iters):
                o = f(args[0] + chain, *args[1:])
                chain = o.reshape(-1)[0] * 0
            fetch_scalar(chain.astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    @jax.jit
    def xla_gather(t, i):
        return t[i]

    try:
        ms = timeit(xla_gather, table, idx)
        print(f"xla gather      : {ms:.3f} ms  ({R*M*2/ms*1e3/1e9:.1f} GB/s out)",
              flush=True)
    except Exception as e:
        print("xla gather failed:", repr(e), flush=True)

    # ---- Pallas: VMEM-resident table + per-chunk dynamic take ----
    def take_kernel(idx_ref, table_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], idx_ref[0], axis=0)

    @jax.jit
    def vmem_take(t, i):
        grid = R // RB
        return pl.pallas_call(
            take_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, RB), lambda j: (0, j)),
                pl.BlockSpec((N_TAB, M), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((RB, M), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((R, M), t.dtype),
        )(i.reshape(1, -1), t)

    try:
        o1 = vmem_take(table, idx)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(table[idx]))
        ms = timeit(vmem_take, table, idx)
        print(f"pallas vmem_take: {ms:.3f} ms", flush=True)
    except Exception as e:
        print("pallas vmem_take failed:", repr(e).splitlines()[0][:300],
              flush=True)

    # ---- Pallas: same but table in ANY + one up-front full-table DMA ----
    def take_kernel2(idx_ref, table_hbm, out_ref, tab_s, sem):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            cp = pltpu.make_async_copy(table_hbm, tab_s, sem)
            cp.start()
            cp.wait()

        out_ref[...] = jnp.take(tab_s[...], idx_ref[0], axis=0)

    @jax.jit
    def vmem_take2(t, i):
        grid = R // RB
        return pl.pallas_call(
            take_kernel2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, RB), lambda j: (0, j)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((RB, M), lambda j: (j, 0)),
            out_shape=jax.ShapeDtypeStruct((R, M), t.dtype),
            scratch_shapes=[
                pltpu.VMEM((N_TAB, M), t.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(i.reshape(1, -1), t)

    try:
        o2 = vmem_take2(table, idx)
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(table[idx]))
        ms = timeit(vmem_take2, table, idx)
        print(f"pallas any+take : {ms:.3f} ms", flush=True)
    except Exception as e:
        print("pallas any+take failed:", repr(e).splitlines()[0][:300],
              flush=True)

    # ---- feature-major variant: table (M, N) in VMEM, take along lanes ----
    def take_kernel3(idx_ref, table_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], idx_ref[0], axis=1)

    @jax.jit
    def vmem_take3(tT, i):
        grid = R // RB
        return pl.pallas_call(
            take_kernel3,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, RB), lambda j: (0, j)),
                pl.BlockSpec((M, N_TAB), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((M, RB), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((M, R), tT.dtype),
        )(i.reshape(1, -1), tT)

    try:
        tT = table.T.copy()
        o3 = vmem_take3(tT, idx)
        np.testing.assert_array_equal(
            np.asarray(o3), np.asarray(table[idx]).T)
        ms = timeit(vmem_take3, tT, idx)
        print(f"pallas lane_take: {ms:.3f} ms", flush=True)
    except Exception as e:
        print("pallas lane_take failed:", repr(e).splitlines()[0][:300],
              flush=True)


if __name__ == "__main__":
    main()
