#!/usr/bin/env python
"""Discriminate per-ARG-LEAF vs per-ARG-BYTE per-call cost on the runtime.

upload_probe.py showed per-call cost is flat in program size (~2 ms) while
the GemNet fwd/train steps measure 52/119 ms — the overhead must ride on the
argument/result structure. Two sweeps with trivial device work:

  A) n_args small scalars in, one scalar out  -> slope = ms per extra LEAF
  B) one fp32 array of M MB in (donated? no), scalar out -> slope = ms per MB

Both chained with value-fetch windows. The GemNet train step has ~50 leaves
and ~60 MB of state; whichever slope explains 119 ms tells us what to
restructure (pack leaves into one buffer vs. cut state bytes).
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

    def time_chained(call, iters=12, windows=3):
        fetch_scalar(call())  # warm
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = call()
            fetch_scalar(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    print("\n# A) leaf-count sweep (scalar args, scalar out)", file=sys.stderr)
    for n in (1, 8, 32, 64, 128):
        args = [jnp.float32(i) for i in range(n)]

        @jax.jit
        def f(*a):
            s = a[0]
            for v in a[1:]:
                s = s + v * 1e-9
            return s

        box = {"a0": args[0]}

        def call(f=f, args=args, box=box):
            box["a0"] = f(box["a0"], *args[1:])
            return box["a0"]

        ms = time_chained(call) * 1e3
        print(f"n_leaves={n:4d}: {ms:8.2f} ms/call", file=sys.stderr)

    print("\n# A2) leaf-count OUTPUT sweep (1 scalar in, n out)", file=sys.stderr)
    for n in (1, 8, 32, 64):

        @jax.jit
        def g(x, n=n):
            return [x + i * 1e-9 for i in range(n)]

        box = {"x": jnp.float32(0)}

        def call(g=g, box=box):
            outs = g(box["x"])
            box["x"] = outs[0]
            return outs[0]

        ms = time_chained(call) * 1e3
        print(f"n_out={n:4d}: {ms:8.2f} ms/call", file=sys.stderr)

    print("\n# B) arg-bytes sweep (one fp32 array arg, threaded)", file=sys.stderr)
    for mb in (1, 4, 16, 64):
        x = jnp.ones((mb * 262144,), jnp.float32)

        @jax.jit
        def h(v):
            return v + 1e-9

        box = {"x": x}

        def call(h=h, box=box):
            box["x"] = h(box["x"])
            return box["x"][0]

        # NB the [0] index is itself a tiny program dispatched once per
        # fetch; keep it outside the timed iters by fetching via a sum probe
        def call2(h=h, box=box):
            box["x"] = h(box["x"])
            return box["x"]

        fetch = lambda arr: float(np.asarray(arr[0]))
        fetch(call2())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(12):
                out = call2()
            fetch(out)
            best = min(best, (time.perf_counter() - t0) / 12)
        print(f"arg={mb:3d} MB: {best*1e3:8.2f} ms/call", file=sys.stderr)

    print("\n# C) arg-bytes sweep, array passed but UNCHANGED (not threaded)",
          file=sys.stderr)
    for mb in (1, 16, 64):
        x = jnp.ones((mb * 262144,), jnp.float32)

        @jax.jit
        def h2(s, v):
            return s + v[0] * 1e-9

        box = {"s": jnp.float32(0)}

        def call(h2=h2, box=box, x=x):
            box["s"] = h2(box["s"], x)
            return box["s"]

        ms = time_chained(call) * 1e3
        print(f"const-arg={mb:3d} MB: {ms:8.2f} ms/call", file=sys.stderr)


if __name__ == "__main__":
    main()
