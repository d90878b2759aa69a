"""Timing instruments that cannot under-report on the tunneled TPU runtime.

Round-3 post-mortem (VERDICT r3): every recorded perf number flowed through
`jax.block_until_ready`, which on the axon tunnel returns before the device
work is actually done — both bench workloads were flagged physically
impossible (measured below the roofline floor). The instruments here share
one principle: **a timing window may only end with a host VALUE FETCH of a
scalar that data-depends on the entire chain of work**. The host cannot hold
the value before the device produced it, so the window is a hard lower bound
on nothing and an upper bound only by the (measured, subtracted) fetch
round-trip.

Usage pattern (bench.py):

    chain = make chained step so call k+1 consumes call k's output
    res = timed_windows(chain_fn, est_seconds_per_iter)
    res["median_s"], res["best_s"]   # per-iter, RTT-corrected

Cross-checks live elsewhere: train.py's long-run wall clock (no barrier can
fake 10k steps) and perf/trace.py's profiler device time.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import numpy as np


def fetch_scalar(x) -> float:
    """Hard barrier: pull a device scalar's VALUE to the host."""
    return float(np.asarray(x))


def measure_rtt(n: int = 30) -> float:
    """Median host<->device round-trip of fetching one FRESH scalar.

    Each iteration dispatches a trivial jitted op and fetches its value —
    fetching the same array twice would read jax's host-side value cache and
    report ~0 (the first version of this probe did exactly that). The result
    slightly over-states a pure fetch (it includes one trivial dispatch),
    which only makes the windows that subtract it conservative.

    This is the constant each timing window pays once at its end. On the
    axon tunnel this is milliseconds (network), on local backends ~us.
    """
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((), jnp.float32)
    fetch_scalar(f(x))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fetch_scalar(f(x))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def timed_windows(
    fn: Callable[[], object],
    windows: int = 5,
    min_window_s: float = 0.5,
    max_iters: int = 2000,
    rtt_s: float | None = None,
) -> dict:
    """Time chained invocations of `fn` with value-fetch barriers.

    `fn()` must (a) dispatch device work whose k+1-th call data-depends on
    the k-th call's output (a train step threading its state does; a pure
    forward must be chained explicitly), and (b) return a device scalar (or
    something np.asarray-able to one element) that depends on that call's
    full computation.

    Each window runs `iters` calls back-to-back and ends with a value fetch
    of the LAST output — the device must have executed every chained call
    before the host sees the value. `iters` is sized so the window is at
    least `min_window_s` AND at least 100x the fetch RTT, so the one fetch
    per window is a bounded, subtracted constant.

    Returns {"best_s", "median_s", "windows_s", "iters", "rtt_s",
             "total_s"} — per-iter seconds, RTT-subtracted.
    """
    if rtt_s is None:
        rtt_s = measure_rtt()

    # pilot window: coarse per-iter estimate (RTT-corrected, >= 1 us floor)
    pilot_iters = 5
    t0 = time.perf_counter()
    for _ in range(pilot_iters):
        out = fn()
    fetch_scalar(out)
    est = max((time.perf_counter() - t0 - rtt_s) / pilot_iters, 1e-6)

    iters = int(min(max_iters, max(10, min_window_s / est, 100 * rtt_s / est)))
    times = []
    t_all = time.perf_counter()
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        fetch_scalar(out)
        times.append(max(time.perf_counter() - t0 - rtt_s, 0.0) / iters)
    return {
        "best_s": min(times),
        "median_s": statistics.median(times),
        "windows_s": times,
        "iters": iters,
        "rtt_s": rtt_s,
        "total_s": time.perf_counter() - t_all,
    }
