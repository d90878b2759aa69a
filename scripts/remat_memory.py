#!/usr/bin/env python
"""Measure HBM effect of remat_blocks on the compiled train step (real TPU).

Compiles the full GemNet-Q training step (double backward + optimizer) on the
bench.py large workload with remat_blocks off/on and prints each program's
XLA memory analysis (temp allocation = live intermediates; this is what
per-block jax.checkpoint trades FLOPs against). Optionally times both.

Run on the TPU: python scripts/remat_memory.py [--time] [--scale N]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true", help="also time the steps")
    ap.add_argument("--n-atoms", type=int, default=32,
                    help="atoms per molecule (quad space grows ~n^4)")
    ap.add_argument("--n-mol", type=int, default=4)
    args = ap.parse_args()

    from bench import make_batch  # repo-root bench.py: the large workload
    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig, load_yaml_config
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    cfg_dict = load_yaml_config("config.yaml")
    base_cfg = ModelConfig.from_dict(cfg_dict)
    tcfg = TrainConfig.from_dict(cfg_dict)
    print("devices:", jax.devices())

    batch, n_real, desc = make_batch(base_cfg, "large")
    print("large batch:", desc)
    lr = jnp.asarray(1.0, jnp.float32)

    for remat in (False, True):
        cfg = dataclasses.replace(base_cfg, remat_blocks=remat)
        model = make_model(cfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
        trainer = Trainer(model, tcfg)
        state = trainer.init_state(dict(variables))
        step = trainer.train_step_fn()

        t0 = time.perf_counter()
        compiled = jax.jit(step).lower(state, batch, lr).compile()
        mem = compiled.memory_analysis()
        print(f"remat_blocks={remat}: compile {time.perf_counter()-t0:.1f}s")
        if mem is not None:
            gb = 1024 ** 3
            print(
                f"  temp={mem.temp_size_in_bytes/gb:.3f} GiB  "
                f"args={mem.argument_size_in_bytes/gb:.3f} GiB  "
                f"out={mem.output_size_in_bytes/gb:.3f} GiB  "
                f"gen={mem.generated_code_size_in_bytes/2**20:.1f} MiB"
            )
        if args.time:
            s = state
            s, m, _ = step(s, batch, lr)
            jax.block_until_ready(m["loss"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    s, m, _ = step(s, batch, lr)
                jax.block_until_ready(m["loss"])
                best = min(best, (time.perf_counter() - t0) / 10)
            print(f"  steady step: {best*1e3:.2f} ms")
        del compiled, step, trainer, state, variables


if __name__ == "__main__":
    main()
