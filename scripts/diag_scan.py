#!/usr/bin/env python
"""Diagnose the scan-of-K-train-steps slowdown on the tunneled TPU runtime.

Times, in ONE process, each program in its own consecutive windows:
  a) single train step            (baseline)
  b) fori_loop of 8 steps on ONE batch (big program, no xs streaming)
  c) lax.scan of 8 steps over stacked packed batches (bench.py scan8 path)
  d) single train step AGAIN      (detects process-wide poisoning)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def window(fn, ready, iters, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(ready(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from bench import make_batch
    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig, load_yaml_config
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    cfg_dict = load_yaml_config("config.yaml")
    cfg = ModelConfig.from_dict(cfg_dict)
    tcfg = TrainConfig.from_dict(cfg_dict)
    print("devices:", jax.devices(), flush=True)

    batch, n_real, desc = make_batch(cfg, "small")
    print("batch:", desc, flush=True)
    model = make_model(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(dict(variables))
    lr = jnp.asarray(1.0, jnp.float32)
    K = 8

    step = trainer.train_step_fn()
    row = trainer.packer.pack({k: np.asarray(v) for k, v in batch.items()})
    jrow = jnp.asarray(row)
    packed = jnp.asarray(np.stack([row] * K))

    # compile everything first
    t0 = time.perf_counter()
    s1, m, _ = step(state, jrow, lr)
    jax.block_until_ready(m["loss"])
    print(f"a compile {time.perf_counter()-t0:.0f}s", flush=True)

    @jax.jit
    def fori8(st, jrow, lr_scale):
        def body(_, s):
            b = trainer.packer.unpack(jrow)
            grad_fn = jax.value_and_grad(
                lambda p: trainer._loss_and_metrics(p, s.scales, b), has_aux=True)
            (_, (metrics, counts)), grads = grad_fn(s.params)
            return trainer.apply_update(s, grads, metrics, counts, lr_scale)
        return jax.lax.fori_loop(0, K, body, st)

    t0 = time.perf_counter()
    s2 = fori8(state, jrow, lr)
    jax.block_until_ready(s2.params)
    print(f"b compile {time.perf_counter()-t0:.0f}s", flush=True)

    multi = trainer.multi_step_fn()
    t0 = time.perf_counter()
    s3, m3, _ = multi(state, packed, lr)
    jax.block_until_ready(m3["loss"])
    print(f"c compile {time.perf_counter()-t0:.0f}s", flush=True)

    # a) single step
    st = [state]
    def run_a():
        st[0], m, _ = step(st[0], jrow, lr)
        return m
    dt = window(run_a, lambda m: m["loss"], iters=10)
    print(f"a single step      {dt*1e3:8.2f} ms/step", flush=True)

    # b) fori_loop x8, same batch
    def run_b():
        st[0] = fori8(st[0], jrow, lr)
        return st[0]
    st[0] = state
    dt = window(run_b, lambda s: s.params, iters=3) / K
    print(f"b fori8 same batch {dt*1e3:8.2f} ms/step", flush=True)

    # c) scan8 stacked batches
    def run_c():
        st[0], m, _ = multi(st[0], packed, lr)
        return m
    st[0] = state
    dt = window(run_c, lambda m: m["loss"], iters=3) / K
    print(f"c scan8 stacked    {dt*1e3:8.2f} ms/step", flush=True)

    # d) single step again — is the process poisoned now?
    st[0] = state
    dt = window(run_a, lambda m: m["loss"], iters=10)
    print(f"d single again     {dt*1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
