#!/usr/bin/env python
"""Round-5 TPU trace attribution: where does the train step's device time go
at HEAD, fp32 and bf16?

Traces 10 executions of the jitted train step per dtype on the bench small
workload, reads back the XSpace, and prints (a) the module device time,
(b) per-category op attribution, (c) the top-k individual ops. This drives
the round-5 kernel roadmap (VERDICT r4 item 1) and the f0 measurement
(item 4: the non-sharded fraction = categories halo cannot shard).

Run (TPU): python scripts/r5_trace.py [float32 bfloat16] [--kind small]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def trace_one(dtype: str, kind: str, outdir: str):
    from bench import make_batch
    from gemnet_pytorch_tpu.config import (
        ModelConfig, TrainConfig, load_yaml_config,
    )
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.perf.timing import fetch_scalar
    from gemnet_pytorch_tpu.perf.trace import (
        op_category_summary, step_device_ms, top_ops,
    )
    from gemnet_pytorch_tpu.training import Trainer

    cfg_dict = load_yaml_config("config.yaml")
    if dtype == "float32_high":  # fp32 + manual 3-pass kernels (FP32_SPLIT3)
        cfg_dict["compute_dtype"] = "float32"
        cfg_dict["matmul_precision"] = "high"
    else:
        cfg_dict["compute_dtype"] = dtype
    cfg = ModelConfig.from_dict(cfg_dict)
    tcfg = TrainConfig.from_dict(cfg_dict)
    model = make_model(cfg)
    batch, n_real, g, dims, batch_np, desc = make_batch(cfg, kind)
    print(f"[{dtype}/{kind}] {desc}", flush=True)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(dict(variables))
    packed = jnp.asarray(trainer.packer.pack(batch_np))
    lr = jnp.asarray(1.0, jnp.float32)
    step = trainer.train_step_fn()

    t0 = time.perf_counter()
    state, m, _ = step(state, packed, lr)
    fetch_scalar(m["loss"])
    print(f"[{dtype}] compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    n_execs = 10
    jax.profiler.start_trace(outdir)
    st, m = state, None
    for _ in range(n_execs):
        st, m, _ = step(st, packed, lr)
    fetch_scalar(m["loss"])
    jax.profiler.stop_trace()

    mt = step_device_ms(outdir, match="step")
    if mt is not None:
        print(f"[{dtype}] DEVICE step: {mt.mean_ms:.3f} ms "
              f"({mt.count} execs of {mt.name})", flush=True)
    print(f"[{dtype}] per-category ms/step:", flush=True)
    for c, ms in op_category_summary(outdir, n_execs).items():
        print(f"    {c:12s} {ms:8.3f} ms", flush=True)
    print(f"[{dtype}] top ops (ms/step):", flush=True)
    print(top_ops(outdir, 40, n_execs), flush=True)
    return mt.mean_ms if mt else None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kind = "small"
    if "--kind" in sys.argv:
        kind = sys.argv[sys.argv.index("--kind") + 1]
    dtypes = args or ["float32", "bfloat16"]
    print("devices:", jax.devices(), flush=True)
    for dt in dtypes:
        trace_one(dt, kind, f"/tmp/r5_trace_{dt}_{kind}")


if __name__ == "__main__":
    main()
