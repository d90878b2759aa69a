#!/usr/bin/env python
"""Benchmark: triplet+quadruplet aggregation throughput per chip.

Runs the flagship GemNet-Q configuration (config.yaml sizes) on a synthetic
COLL-like batch and measures steady-state jitted forward+force throughput,
reported as (real triplets + real quadruplets) processed per second per chip —
the BASELINE.json headline metric. Prints ONE JSON line on stdout.

vs_baseline: the reference publishes no in-repo numbers (BASELINE.md);
the ratio is against this repo's recorded round-1 number (BENCH_BASE below)
so progress across rounds is visible.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BENCH_BASE = 3.64e8  # triplets+quads/s measured round 1 on TPU v5e (this repo)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, load_yaml_config
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import random_molecule
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model

    cfg_dict = load_yaml_config("config.yaml")
    cfg = ModelConfig.from_dict({**cfg_dict, "direct_forces": True})
    log("devices:", jax.devices())

    # batch of 32 molecules, 8-12 atoms (COLL-like sizes)
    rng = np.random.default_rng(0)
    mols = [random_molecule(rng, int(rng.integers(8, 13))) for _ in range(32)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=False)
    base = PadDims(n_mol=32, n_atoms=16, n_edges=128, n_triplets=256, kmax3=4,
                   n_int_edges=64, n_intm=256, n_quads=512, kmax4=4)
    dims = base.grow_to(_scale_graph_dims(g, 1.05), 32, len(Z))
    batch_np = pad_batch(g, Z, R, dims, triplets_only=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    n_real = g.n_triplets + g.n_quads
    log(f"batch: {g.n_edges} edges, {g.n_triplets} triplets, {g.n_quads} quads "
        f"(padded {dims.n_triplets}/{dims.n_quads}, kmax4={dims.kmax4})")

    model = make_model(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    @jax.jit
    def forward(variables, batch):
        E, F, _ = energy_and_forces(model, variables, batch)
        return E, F

    t0 = time.perf_counter()
    E, F = forward(variables, batch)
    jax.block_until_ready(E)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    # steady state
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        E, F = forward(variables, batch)
    jax.block_until_ready(E)
    dt = (time.perf_counter() - t0) / iters
    per_sec = n_real / dt
    log(f"steady: {dt*1e3:.2f} ms/batch -> {per_sec:.3e} trip+quad/s")

    print(json.dumps({
        "metric": "triplets+quads aggregated/sec/chip (GemNet-Q fwd+forces)",
        "value": per_sec,
        "unit": "agg/s/chip",
        "vs_baseline": per_sec / BENCH_BASE,
    }))


if __name__ == "__main__":
    main()
