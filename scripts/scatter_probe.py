#!/usr/bin/env python
"""Probe quad-space scatter/gather strategies on the TPU (in-program loops).

The train-step trace shows ~20 ms/step of XLA scatter-adds (the VJPs of the
id4_expand_* gathers, e.g. f32[192512,32] -> f32[29184,32] at ~1.33 ms each)
and ~2.7 ms of pathologically slow SCALAR gathers (f32[29184] -> f32[192512]
at 1.37 ms). Candidate replacements, timed as K-iteration scan loops inside
one program (per-dispatch overhead ~2-7 ms would otherwise drown them):

  scatter      : zeros.at[idx].add(cot)            (the status-quo VJP)
  sorted-segsum: segment_sum(cot[perm], sorted_ids, indices_are_sorted=True)
  gather1d     : x[idx] for x (29184,)             (the slow scalar gather)
  gather2d     : x[:, None][idx][:, 0]             (same result, 2-D layout)
  gather32     : x32[idx]                          (the 32-wide baseline)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.perf.timing import fetch_scalar

    print("devices:", jax.devices(), file=sys.stderr)
    n, n_src, M = 192512, 29184, 32
    rng = np.random.default_rng(0)
    idx_np = np.sort(rng.integers(0, n_src - 1, n)).astype(np.int32)
    # unsorted variant (the real id4_expand_abd is unsorted wrt quad order)
    idx_unsorted_np = rng.permutation(idx_np)
    perm_np = np.argsort(idx_unsorted_np, kind="stable").astype(np.int32)
    sorted_ids_np = idx_unsorted_np[perm_np]

    idx = jnp.asarray(idx_unsorted_np)
    perm = jnp.asarray(perm_np)
    sorted_ids = jnp.asarray(sorted_ids_np)
    cot = jnp.asarray(rng.standard_normal((n, M), np.float32))
    x1 = jnp.asarray(rng.standard_normal((n_src,), np.float32))
    x32 = jnp.asarray(rng.standard_normal((n_src, M), np.float32))

    K = 16

    def timeit(name, call, *args):
        jf = jax.jit(call)
        try:
            fetch_scalar(jf(*args))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:90]}",
                  file=sys.stderr)
            return
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch_scalar(jf(*args))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{name}: {best*1e3:7.3f} ms/iter", file=sys.stderr)

    def scatter(c):
        def body(c, _):
            out = jnp.zeros((n_src, M), jnp.float32).at[idx].add(c)
            return c + out[0, 0] * 0, ()

        y, _ = jax.lax.scan(body, c, None, length=K)
        return y[0, 0]

    def sorted_segsum(c):
        def body(c, _):
            out = jax.ops.segment_sum(
                c[perm], sorted_ids, num_segments=n_src,
                indices_are_sorted=True)
            return c + out[0, 0] * 0, ()

        y, _ = jax.lax.scan(body, c, None, length=K)
        return y[0, 0]

    def segsum_nosort_flag(c):
        def body(c, _):
            out = jax.ops.segment_sum(c[perm], sorted_ids, num_segments=n_src)
            return c + out[0, 0] * 0, ()

        y, _ = jax.lax.scan(body, c, None, length=K)
        return y[0, 0]

    def gather1d(v):
        def body(v, _):
            out = v[idx]
            return v + out[0] * 0, ()

        y, _ = jax.lax.scan(body, v, None, length=K)
        return y[0]

    def gather2d(v):
        def body(v, _):
            out = v[:, None][idx][:, 0]
            return v + out[0] * 0, ()

        y, _ = jax.lax.scan(body, v, None, length=K)
        return y[0]

    def gather32(v):
        def body(v, _):
            out = v[idx]
            return v + out[0, 0] * 0, ()

        y, _ = jax.lax.scan(body, v, None, length=K)
        return y[0, 0]

    # correctness cross-check first (CPU-exact on device)
    a = np.zeros((n_src, M), np.float32)
    np.add.at(a, idx_unsorted_np, np.asarray(cot))
    b = jax.ops.segment_sum(cot[perm], sorted_ids, num_segments=n_src,
                            indices_are_sorted=True)
    err = float(jnp.max(jnp.abs(b - a)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"sorted-segsum vs np.add.at rel err: {err:.2e}", file=sys.stderr)

    timeit("scatter-add   (n,32)->(src,32)", scatter, cot)
    timeit("perm+segsum sorted flag       ", sorted_segsum, cot)
    timeit("perm+segsum no flag           ", segsum_nosort_flag, cot)
    timeit("gather 1d  (src,)->(n,)       ", gather1d, x1)
    timeit("gather 2d  (src,1)->(n,1)     ", gather2d, x1)
    timeit("gather 32w (src,32)->(n,32)   ", gather32, x32)


if __name__ == "__main__":
    main()
