#!/usr/bin/env python
"""Decompose the train step's wall time on the real TPU, in ONE process.

The in-process A/B (scripts/bench_ab.py) showed a 12.8x-larger quad space
costs +3% wall time -> the small-batch step is dominated by size-invariant
overhead, not FLOPs. This pins down where it lives by timing, back-to-back:

  fwd            model apply (energy+forces)
  grads          jax.value_and_grad of the loss (incl. double backward)
  opt            optimizer.update + apply_updates + EMA, on fixed grads
  step           the full train step

Each is its own jit; interleaved windows cancel pool drift.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from bench import make_batch
    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig, load_yaml_config
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer
    from gemnet_pytorch_tpu.training.trainer import device_batch

    cfg_dict = load_yaml_config("config.yaml")
    cfg = ModelConfig.from_dict(cfg_dict)
    tcfg = TrainConfig.from_dict(cfg_dict)
    print("devices:", jax.devices(), flush=True)

    batch, n_real, desc = make_batch(cfg, sys.argv[1] if len(sys.argv) > 1 else "small")
    print("batch:", desc, flush=True)
    model = make_model(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(dict(variables))
    lr = jnp.asarray(1.0, jnp.float32)
    dbatch = device_batch(batch)

    from gemnet_pytorch_tpu.models.gemnet import energy_and_forces

    @jax.jit
    def fwd(params, scales, b):
        return energy_and_forces(model, {"params": params, "scale_factors": scales}, b)[:2]

    @jax.jit
    def grads_fn(params, scales, b):
        g = jax.grad(lambda p: trainer._loss_and_metrics(p, scales, b)[0])(params)
        return g

    if trainer.flat:
        from gemnet_pytorch_tpu.training import flat_opt

        @jax.jit
        def opt_fn(state, grads, lr_scale):
            params, ema, opt_state = flat_opt.apply_update(
                grads, state.opt_state, state.params, state.ema_params, lr_scale,
                schedule=trainer._sched_base, learning_rate=tcfg.learning_rate,
                grad_clip_max=tcfg.grad_clip_max, ema_decay=tcfg.ema_decay)
            return state.replace(params=params, opt_state=opt_state, ema_params=ema)
    else:
        optimizer = trainer.optimizer

        @jax.jit
        def opt_fn(state, grads, lr_scale):
            import optax

            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(state.params, updates)
            ema = jax.tree_util.tree_map(
                lambda s, p: s - (1.0 - tcfg.ema_decay) * (s - p), state.ema_params, params
            )
            return state.replace(params=params, opt_state=opt_state, ema_params=ema)

    step = trainer.train_step_fn()

    # compile all
    t0 = time.perf_counter(); E, F = fwd(state.params, state.scales, dbatch)
    jax.block_until_ready(E); print(f"fwd compile {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter(); g = grads_fn(state.params, state.scales, dbatch)
    jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
    print(f"grads compile {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter(); st2 = opt_fn(state, g, lr)
    jax.block_until_ready(st2.step); print(f"opt compile {time.perf_counter()-t0:.0f}s", flush=True)
    packed = jnp.asarray(trainer.packer.pack(batch))
    t0 = time.perf_counter(); st3, m, _ = step(state, packed, lr)
    jax.block_until_ready(m["loss"]); print(f"step compile {time.perf_counter()-t0:.0f}s", flush=True)

    best = {"fwd": float("inf"), "grads": float("inf"), "opt": float("inf"),
            "step": float("inf")}
    N = 10
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(N):
            E, F = fwd(state.params, state.scales, dbatch)
        jax.block_until_ready(E)
        best["fwd"] = min(best["fwd"], (time.perf_counter() - t0) / N)

        t0 = time.perf_counter()
        for _ in range(N):
            g = grads_fn(state.params, state.scales, dbatch)
        jax.block_until_ready(jax.tree_util.tree_leaves(g)[0])
        best["grads"] = min(best["grads"], (time.perf_counter() - t0) / N)

        t0 = time.perf_counter()
        s = state
        for _ in range(N):
            s = opt_fn(s, g, lr)
        jax.block_until_ready(s.step)
        best["opt"] = min(best["opt"], (time.perf_counter() - t0) / N)

        t0 = time.perf_counter()
        s = state
        for _ in range(N):
            s, m, _ = step(s, packed, lr)
        jax.block_until_ready(m["loss"])
        best["step"] = min(best["step"], (time.perf_counter() - t0) / N)

    for k, v in best.items():
        print(f"{k:6s} {v*1e3:7.2f} ms", flush=True)
    print(f"residual (step - grads - opt): "
          f"{(best['step']-best['grads']-best['opt'])*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
