#!/usr/bin/env python
"""Measure per-call overhead vs compiled-program size on the live runtime.

Hypothesis under test (CLAUDE.md "degraded-pool mode", observed round 2-4):
the pooled/tunneled TPU runtime sometimes pays a per-execution cost
proportional to program size (~60-90 MB/s), as if the program binary (and/or
its baked constants) is re-shipped every call. This probe times chained
executions of programs whose device work is trivial but whose size is swept
two ways:

1. constants: a baked (compile-time-constant) fp32 array of 1/4/16/64 MB,
   reduced with a tiny epsilon so XLA cannot DCE it;
2. code: K distinct unrolled 256x256 matmuls with distinct scalar factors
   (no CSE), K = 8/64/256 — generated code grows with K.

Per-call time is measured with value-fetch barriers (perf/timing). A flat
curve = healthy pool (per-call cost independent of size); a linear curve
gives the effective re-upload bandwidth. Run it BEFORE recording any bench
number to know which regime the pool is in (bench.py --skip-large
--skip-roofline is the cross-check).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.perf.timing import fetch_scalar, measure_rtt

    print("devices:", jax.devices(), file=sys.stderr)
    rtt = measure_rtt()
    print(f"fresh-scalar fetch RTT: {rtt*1e3:.2f} ms", file=sys.stderr)

    def time_chained(f, x, iters=12, windows=3):
        fetch_scalar(f(x))  # compile + warm
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            y = x
            for _ in range(iters):
                y = f(y)
            fetch_scalar(y)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def code_size(f, x):
        try:
            ma = jax.jit(f).lower(x).compile().memory_analysis()
            return ma.generated_code_size_in_bytes
        except Exception:
            return -1

    x = jnp.ones((), jnp.float32)

    print("\n# constants sweep (baked fp32 arrays)", file=sys.stderr)
    rng = np.random.default_rng(0)
    for mb in (1, 4, 16, 64):
        const = jnp.asarray(rng.random((mb * 262144,), np.float32))

        def f(v, c=const):
            return v + jnp.sum(c) * 1e-30

        jf = jax.jit(f)
        ms = time_chained(jf, x) * 1e3
        print(f"const {mb:3d} MB: {ms:8.2f} ms/call  code "
              f"{code_size(f, x)/1e6:.1f} MB", file=sys.stderr)

    print("\n# unrolled-code sweep (K distinct 256^2 matmuls)", file=sys.stderr)
    a = jnp.ones((256, 256), jnp.float32)
    for K in (8, 64, 256):

        def g(v, K=K):
            m = a * (1.0 + v * 0)
            for i in range(K):
                m = (m @ a) * (1.0 / 256.0 + i * 1e-12)
            return m[0, 0]

        jg = jax.jit(g)
        # chain through the scalar output
        def h(v, jg=jg):
            return jg(v)

        ms = time_chained(jax.jit(h), x) * 1e3
        print(f"K={K:4d}: {ms:8.2f} ms/call  code "
              f"{code_size(g, x)/1e6:.2f} MB", file=sys.stderr)


if __name__ == "__main__":
    main()
