"""Shared deterministic setup for the multi-process dp smoke test: the same
(model, trainer state, per-device batches) must be reconstructible bit-
identically inside each worker process and the single-process reference."""

import numpy as np


def make_setup(n_batches):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.training import Trainer

    cfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=8, emb_size_rbf=8,
        emb_size_cbf=8, emb_size_sbf=8, emb_size_bil_quad=8, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True,
    )
    # fixed pad dims so every per-device batch compiles to one shape
    dims = PadDims(n_mol=2, n_atoms=32, n_edges=256, n_triplets=1024, kmax3=16,
                   n_int_edges=0, n_intm=0, n_quads=0, kmax4=0)
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(n_batches):
        mols = [random_molecule(rng, int(rng.integers(6, 9))) for _ in range(2)]
        N = np.array([len(z) for z, _ in mols])
        Z = np.concatenate([z for z, _ in mols])
        R = np.concatenate([r for _, r in mols])
        EF = [_toy_energy_forces(z, r) for z, r in mols]
        E = np.array([e for e, _ in EF], np.float32)
        F = np.concatenate([f for _, f in EF])
        g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=True)
        batches.append(
            pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=True)
        )

    model = make_model(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in batches[0].items()}
    variables = dict(model.init(jax.random.PRNGKey(0), jbatch))
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, num_steps=100,
                       loss="rmse", ema_decay=0.9)
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)
    return trainer, state, batches


def make_halo_setup(n_shards):
    """One deterministic 4-molecule GemNet-T batch halo-partitioned over
    `n_shards`, plus trainer/state — reconstructible bit-identically in every
    worker process and the single-process reference."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig, TrainConfig
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import PadDims, pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule
    from gemnet_pytorch_tpu.models import make_model
    from gemnet_pytorch_tpu.parallel.halo import build_halo_partition
    from gemnet_pytorch_tpu.training import Trainer

    cfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=8, emb_size_rbf=8,
        emb_size_cbf=8, emb_size_sbf=8, emb_size_bil_quad=8, emb_size_bil_trip=8,
        triplets_only=True, direct_forces=True,
    )
    rng = np.random.default_rng(11)
    mols = [random_molecule(rng, int(rng.integers(6, 9))) for _ in range(4)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E = np.array([e for e, _ in EF], np.float32)
    F = np.concatenate([f for _, f in EF])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=True)

    dims = PadDims(n_mol=4, n_atoms=48, n_edges=256, n_triplets=1024, kmax3=16,
                   n_int_edges=0, n_intm=0, n_quads=0, kmax4=0)
    init_batch = pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=True)
    part = build_halo_partition(
        g, Z, R, n_shards, E=E, F=F, triplets_only=True,
        n_mol_pad=4, n_atoms_pad=dims.n_atoms,
    )

    model = make_model(cfg)
    jbatch = {k: jnp.asarray(v) for k, v in init_batch.items()}
    variables = dict(model.init(jax.random.PRNGKey(0), jbatch))
    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, num_steps=100,
                       loss="rmse", ema_decay=0.9)
    trainer = Trainer(model, tcfg)
    state = trainer.init_state(variables)
    return trainer, state, part
