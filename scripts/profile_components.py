#!/usr/bin/env python
"""Component-level timing on the bench workload: which ops dominate the
GemNet-Q step, to target Pallas work where it pays."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from gemnet_pytorch_tpu.config import ModelConfig, load_yaml_config
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, _scale_graph_dims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import random_molecule, _toy_energy_forces
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.ops.segment import (
        masked_segment_sum,
        scatter_to_padded_dense,
    )

    cfg_dict = load_yaml_config("config.yaml")
    cfg = ModelConfig.from_dict({**cfg_dict, "direct_forces": True})
    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)
    mols = [random_molecule(rng, int(rng.integers(8, 13))) for _ in range(32)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E = np.array([e for e, _ in EF], np.float32)
    F = np.concatenate([f for _, f in EF])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=False)
    base = PadDims(n_mol=32, n_atoms=16, n_edges=128, n_triplets=256, kmax3=4,
                   n_int_edges=64, n_intm=256, n_quads=512, kmax4=4)
    dims = base.grow_to(_scale_graph_dims(g, 1.05), 32, len(Z))
    batch_np = pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    print(f"dims: {dims}", file=sys.stderr)

    model = make_model(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    # 1. full forward (direct forces)
    @jax.jit
    def fwd(variables, batch):
        E, F, _ = energy_and_forces(model, variables, batch)
        return E

    print(f"forward(direct):      {timeit(fwd, variables, batch)*1e3:8.3f} ms")

    # 1b. full train step
    from gemnet_pytorch_tpu.config import TrainConfig
    from gemnet_pytorch_tpu.training import Trainer

    trainer = Trainer(model, TrainConfig(weight_decay=2e-6, loss="rmse"))
    state = trainer.init_state(dict(variables))
    step_fn = trainer.train_step_fn()
    lr = jnp.asarray(1.0)
    t = timeit(lambda s: step_fn(s, batch, lr)[1]["loss"], state, iters=10)
    print(f"train step (direct):  {t*1e3:8.3f} ms")

    # autograd-force model
    cfg2 = ModelConfig.from_dict({**cfg_dict, "direct_forces": False})
    model2 = make_model(cfg2)
    variables2 = jax.jit(model2.init)(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd2(variables, batch):
        E, F, _ = energy_and_forces(model2, variables, batch)
        return E

    print(f"forward(-dE/dR):      {timeit(fwd2, variables2, batch)*1e3:8.3f} ms")
    trainer2 = Trainer(model2, TrainConfig(weight_decay=2e-6, loss="rmse"))
    state2 = trainer2.init_state(dict(variables2))
    step2 = trainer2.train_step_fn()
    t = timeit(lambda s: step2(s, batch, lr)[1]["loss"], state2, iters=10)
    print(f"train step (-dE/dR):  {t*1e3:8.3f} ms")

    # 2. quad sph scatter (the big dense build): (Q,S^2) -> (E,Kmax4,S^2)
    S2 = cfg.num_spherical**2
    sph = jnp.ones((dims.n_quads, S2), jnp.float32)
    t = timeit(
        jax.jit(
            lambda s: scatter_to_padded_dense(
                s, batch["id4_reduce_ca"], batch["Kidx4"], dims.n_edges,
                dims.kmax4, mask=batch["quad_mask"],
            )
        ),
        sph,
    )
    print(f"quad sph scatter:     {t*1e3:8.3f} ms   (-> {dims.n_edges}x{dims.kmax4}x{S2})")

    # 3. quad bilinear einsum chain
    emb_q = cfg.emb_size_quad
    sph_dense = jnp.ones((dims.n_edges, dims.kmax4, S2), jnp.float32)
    m2 = jnp.ones((dims.n_edges, dims.kmax4, emb_q), jnp.float32)
    rbf_W1 = jnp.ones((dims.n_edges, cfg.emb_size_sbf, S2), jnp.float32)
    W2 = jnp.ones((emb_q, cfg.emb_size_sbf, cfg.emb_size_bil_quad), jnp.float32)

    @jax.jit
    def bil(sph_dense, m2, rbf_W1, W2):
        sum_k = jnp.einsum("eks,ekm->esm", sph_dense, m2)
        r = jnp.einsum("eis,esm->eim", rbf_W1, sum_k)
        return jnp.einsum("eim,mio->eo", r, W2)

    t = timeit(bil, sph_dense, m2, rbf_W1, W2)
    print(f"quad bilinear chain:  {t*1e3:8.3f} ms")

    # 4. edge->atom segment sum
    m = jnp.ones((dims.n_edges, cfg.emb_size_edge), jnp.float32)
    t = timeit(
        jax.jit(
            lambda m: masked_segment_sum(
                m, batch["id_a"], dims.n_atoms, mask=batch["edge_mask"]
            )
        ),
        m,
    )
    print(f"edge->atom segsum:    {t*1e3:8.3f} ms")

    # 5. basis evaluation (sbf on quads)
    from gemnet_pytorch_tpu.models.basis import SphericalBasis

    sb = SphericalBasis(cfg.num_spherical, cfg.num_radial, cfg.cutoff)
    ang1 = jnp.ones((dims.n_quads,), jnp.float32)
    t = timeit(jax.jit(lambda a: sb.sbf(a, a)), ang1)
    print(f"sbf eval (quads):     {t*1e3:8.3f} ms")

    # 6. trip scatter + bilinear
    S = cfg.num_spherical
    spht = jnp.ones((dims.n_triplets, S), jnp.float32)
    t = timeit(
        jax.jit(
            lambda s: scatter_to_padded_dense(
                s, batch["id3_reduce_ca"], batch["Kidx3"], dims.n_edges,
                dims.kmax3, mask=batch["trip_mask"],
            )
        ),
        spht,
    )
    print(f"trip sph scatter:     {t*1e3:8.3f} ms")

    # 7. quad m scatter: (Q, emb_q) -> (E, Kmax4, emb_q)
    mq = jnp.ones((dims.n_quads, emb_q), jnp.float32)
    t = timeit(
        jax.jit(
            lambda s: scatter_to_padded_dense(
                s, batch["id4_reduce_ca"], batch["Kidx4"], dims.n_edges,
                dims.kmax4, mask=batch["quad_mask"],
            )
        ),
        mq,
    )
    print(f"quad m scatter:       {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
