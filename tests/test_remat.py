"""remat_blocks: per-block rematerialization must not change numerics.

The flag wraps each InteractionBlock/OutputBlock pair in jax.checkpoint
(nn.remat) so the force-training double backward recomputes block
intermediates instead of holding them — energies, forces, and parameter
gradients must be bit-compatible with the unremat'd model (fp32, same op
order inside the block)."""

import dataclasses

import numpy as np
import pytest


def _cfg(**kw):
    from gemnet_pytorch_tpu.config import ModelConfig

    return ModelConfig(
        num_spherical=3, num_radial=3, num_blocks=2, emb_size_atom=16,
        emb_size_edge=16, emb_size_trip=8, emb_size_quad=4, emb_size_rbf=4,
        emb_size_cbf=4, emb_size_sbf=4, emb_size_bil_quad=4,
        emb_size_bil_trip=8, **kw,
    )


def _batch(cfg, rng):
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.padding import (
        PadDims, _scale_graph_dims, pad_batch,
    )
    from gemnet_pytorch_tpu.data.synthetic import random_molecule

    Z, R = random_molecule(rng, 8)
    g = build_graph(R, np.array([8]), cfg.cutoff, cfg.int_cutoff,
                    triplets_only=cfg.triplets_only)
    dims = PadDims(
        n_mol=1, n_atoms=16, n_edges=128, n_triplets=512, kmax3=8,
        n_int_edges=0 if cfg.triplets_only else 64,
        n_intm=0 if cfg.triplets_only else 512,
        n_quads=0 if cfg.triplets_only else 512,
        kmax4=0 if cfg.triplets_only else 8,
    ).grow_to(_scale_graph_dims(g, 1.1), 1, 8)
    return {k: jnp.asarray(v) for k, v in
            pad_batch(g, Z, R, dims, triplets_only=cfg.triplets_only).items()}


@pytest.mark.parametrize("triplets_only", [True, False], ids=["T", "Q"])
def test_remat_blocks_identical(triplets_only):
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models import energy_and_forces, make_model

    cfg = _cfg(triplets_only=triplets_only, direct_forces=False)
    batch = _batch(cfg, np.random.default_rng(0))
    model = make_model(cfg)
    model_r = make_model(dataclasses.replace(cfg, remat_blocks=True))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    # the param tree is unchanged by remat (lifted transform, same scope)
    vr = jax.jit(model_r.init)(jax.random.PRNGKey(0), batch)
    assert jax.tree_util.tree_structure(vr["params"]) == \
        jax.tree_util.tree_structure(variables["params"])

    E0, F0, _ = energy_and_forces(model, variables, batch)
    E1, F1, _ = energy_and_forces(model_r, variables, batch)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(F1), np.asarray(F0), rtol=1e-6)

    # double backward: grad wrt params of a loss with the -dE/dR force term
    def loss(m, v, b):
        E, F, _ = energy_and_forces(m, v, b)
        return jnp.sum(jnp.abs(E)) + jnp.sum(jnp.abs(F))

    g0 = jax.grad(lambda p: loss(model, {**variables, "params": p}, batch))(
        variables["params"])
    g1 = jax.grad(lambda p: loss(model_r, {**variables, "params": p}, batch))(
        variables["params"])
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
