"""dp x ep composed mesh: global loss and gradients must equal the
single-device computation over the union of the dp shards."""

import numpy as np
import pytest


def _shard(seed, cfg, dims):
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import pad_batch
    from gemnet_pytorch_tpu.data.synthetic import _toy_energy_forces, random_molecule

    rng = np.random.default_rng(seed)
    mols = [random_molecule(rng, int(rng.integers(6, 9))) for _ in range(2)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    EF = [_toy_energy_forces(z, r) for z, r in mols]
    E = np.array([e for e, _ in EF], np.float32)
    F = np.concatenate([f for _, f in EF])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=cfg.triplets_only)
    return pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=cfg.triplets_only)


def test_hybrid_dp_ep_grads_match_single_device():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.config import ModelConfig
    from gemnet_pytorch_tpu.data.padding import PadDims
    from gemnet_pytorch_tpu.models import energy_and_forces, make_model
    from gemnet_pytorch_tpu.parallel.hybrid import (
        build_hybrid_batch, make_hybrid_loss_and_grad, make_hybrid_mesh,
        shard_hybrid_batch,
    )

    cfg = ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=1, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=8, emb_size_rbf=8,
        emb_size_cbf=8, emb_size_sbf=8, emb_size_bil_quad=8, emb_size_bil_trip=8,
        triplets_only=False, direct_forces=True,
    )
    dims = PadDims(n_mol=2, n_atoms=32, n_edges=256, n_triplets=1024, kmax3=16,
                   n_int_edges=256, n_intm=1024, n_quads=4096, kmax4=64)
    shards = [_shard(s, cfg, dims) for s in range(2)]

    model = make_model(cfg)
    jb0 = {k: jnp.asarray(v) for k, v in shards[0].items()}
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jb0))

    def parts(E, F, b):
        m = b["mol_mask"].astype(jnp.float32)[:, None]
        am = b["atom_mask"].astype(jnp.float32)[:, None]
        num = (jnp.sum(jnp.abs(E - b["E"]) * m)
               + jnp.sum(jnp.abs(F[:, 0, :] - b["F"]) * am))
        den = jnp.sum(m) + jnp.sum(am)
        return num, den

    # single-device reference over the union of shards
    def loss_single(variables):
        num = den = 0.0
        for b in shards:
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            E, F, _ = energy_and_forces(model, variables, jb)
            n, d = parts(E, F, jb)
            num, den = num + n, den + d
        return num / den

    loss_ref, g_ref = jax.value_and_grad(loss_single)(variables)

    mesh = make_hybrid_mesh(2, 2)
    hybrid = build_hybrid_batch(shards, n_ep=2)
    sharded = shard_hybrid_batch(hybrid, mesh)
    lg = make_hybrid_loss_and_grad(model, mesh, parts)
    loss, grads = lg(variables, sharded)

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat = jax.tree_util.tree_leaves(grads)
    bad = []
    for (path, a), b in zip(flat_ref, flat):
        a, b = np.asarray(a), np.asarray(b)
        err = np.abs(a - b).max()
        if err > 1e-4 + 1e-3 * np.abs(a).max():
            bad.append(("/".join(str(getattr(k, "key", k)) for k in path),
                        float(err)))
    assert not bad, bad[:8]
