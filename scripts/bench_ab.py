#!/usr/bin/env python
"""In-process A/B of train-step variants on the real TPU.

The shared v5e pool drifts ~1.5x between sessions, so cross-process
comparisons are unreliable (observed: the same fp32 step at 6.46 and
9.63 ms an hour apart). This measures all requested variants back-to-back
in ONE process, interleaving the timing windows so drift hits every
variant equally.

Usage: python scripts/bench_ab.py [small,large] [fp32,bf16]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    kinds = (sys.argv[1] if len(sys.argv) > 1 else "small,large").split(",")
    dtypes = (sys.argv[2] if len(sys.argv) > 2 else "fp32,bf16").split(",")

    from bench import make_batch
    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig, load_yaml_config
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    cfg_dict = load_yaml_config("config.yaml")
    print("devices:", jax.devices(), flush=True)
    lr = jnp.asarray(1.0, jnp.float32)

    variants = {}  # name -> (step_fn, state, batch, n_real)
    for kind in kinds:
        for dt in dtypes:
            cfg = ModelConfig.from_dict({
                **cfg_dict,
                "compute_dtype": {"fp32": "float32", "bf16": "bfloat16"}[dt],
            })
            tcfg = TrainConfig.from_dict(cfg_dict)
            batch, n_real, desc = make_batch(cfg, kind)
            model = make_model(cfg)
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
            trainer = Trainer(model, tcfg)
            state = trainer.init_state(dict(variables))
            step = trainer.train_step_fn()
            t0 = time.perf_counter()
            state, m, _ = step(state, batch, lr)
            jax.block_until_ready(m["loss"])
            print(f"[{kind}/{dt}] {desc}; compile {time.perf_counter()-t0:.0f}s",
                  flush=True)
            variants[f"{kind}/{dt}"] = [step, state, batch, n_real]

    # interleaved windows: drift hits all variants equally
    best = {k: float("inf") for k in variants}
    for _ in range(5):
        for name, v in variants.items():
            step, state, batch, n_real = v
            t0 = time.perf_counter()
            for _ in range(10):
                state, m, _ = step(state, batch, lr)
            jax.block_until_ready(m["loss"])
            v[1] = state
            best[name] = min(best[name], (time.perf_counter() - t0) / 10)

    for name, dt in best.items():
        n_real = variants[name][3]
        print(f"{name:12s} {dt*1e3:7.2f} ms/step   {n_real/dt:.3e} agg/s",
              flush=True)


if __name__ == "__main__":
    main()
