"""Per-layer numerical parity against the reference torch layers."""

import numpy as np
import pytest

from conftest import add_reference_shims


def _dense_variables(torch_weight, flax_module, x_shape):
    import jax
    import jax.numpy as jnp

    v = flax_module.init(jax.random.PRNGKey(0), jnp.zeros(x_shape))
    v = jax.tree_util.tree_map(np.asarray, v)
    v["params"]["Dense_0"]["kernel"] = torch_weight.T
    return v


def test_dense_scaled_silu_parity():
    add_reference_shims()
    import torch

    from gemnet.model.layers.base_layers import Dense as RefDense
    from gemnet_pytorch_tpu.models.layers import Dense

    torch.manual_seed(0)
    ref = RefDense(16, 8, activation="swish")
    x = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    ref_y = ref(torch.tensor(x)).detach().numpy()

    mine = Dense(8, activation="swish")
    v = _dense_variables(ref.weight.detach().numpy(), mine, (5, 16))
    y = np.asarray(mine.apply(v, x))
    np.testing.assert_allclose(y, ref_y, rtol=1e-5, atol=1e-6)


def test_residual_layer_parity():
    add_reference_shims()
    import jax
    import torch

    from gemnet.model.layers.base_layers import ResidualLayer as RefRes
    from gemnet_pytorch_tpu.models.layers import ResidualLayer

    torch.manual_seed(0)
    ref = RefRes(16, activation="swish")
    x = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    ref_y = ref(torch.tensor(x)).detach().numpy()

    mine = ResidualLayer(16, activation="swish")
    v = mine.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(np.asarray, v)
    for k, layer in enumerate(ref.dense_mlp):
        v["params"][f"dense_{k}"]["Dense_0"]["kernel"] = layer.weight.detach().numpy().T
    y = np.asarray(mine.apply(v, x))
    np.testing.assert_allclose(y, ref_y, rtol=1e-5, atol=1e-6)


def test_efficient_bilinear_parity():
    """Bilinear contraction vs reference EfficientInteractionBilinear
    (efficient.py:120-189) on a random grouped layout."""
    add_reference_shims()
    import jax
    import torch

    from gemnet.model.layers.efficient import EfficientInteractionBilinear as RefBil
    from gemnet_pytorch_tpu.ops.bilinear import bilinear

    rng = np.random.default_rng(1)
    n_edges, S, emb, interm, out = 12, 7, 8, 6, 10
    n_rows = 20
    id_reduce = np.sort(rng.integers(0, n_edges, size=n_rows))
    kidx = np.zeros(n_rows, np.int64)
    for e in np.unique(id_reduce):
        sel = np.nonzero(id_reduce == e)[0]
        kidx[sel] = np.arange(len(sel))
    kmax = int(kidx.max()) + 1  # reference derives Kmax dynamically

    rbf_W1 = rng.normal(size=(n_edges, interm, S)).astype(np.float32)
    sph_dense = np.zeros((n_edges, kmax, S), np.float32)
    sph_rows = rng.normal(size=(n_rows, S)).astype(np.float32)
    sph_dense[id_reduce, kidx] = sph_rows
    m = rng.normal(size=(n_rows, emb)).astype(np.float32)

    torch.manual_seed(0)
    ref = RefBil(emb, interm, out)
    ref_y = ref(
        (torch.tensor(rbf_W1), torch.tensor(np.transpose(sph_dense, (0, 2, 1)))),
        torch.tensor(m), torch.tensor(id_reduce), torch.tensor(kidx),
    ).detach().numpy()

    w = ref.weight.detach().numpy()
    splits = np.searchsorted(id_reduce, np.arange(0, n_edges + 32, 32)).astype(np.int32)
    y = np.asarray(
        bilinear(rbf_W1, sph_rows, m, id_reduce, splits, w,
                 mask=np.ones(n_rows, bool), implementation="xla")
    )
    np.testing.assert_allclose(y, ref_y, rtol=1e-4, atol=1e-5)


def test_he_orthogonal_init_statistics():
    """Init distribution matches the reference's he_orthogonal construction:
    ~zero mean, variance 1/fan_in, near-orthogonal rows."""
    import jax

    from gemnet_pytorch_tpu.models.initializers import he_orthogonal

    w = np.asarray(he_orthogonal(jax.random.PRNGKey(0), (256, 64)))
    assert abs(w.mean()) < 1e-3
    np.testing.assert_allclose(w.var(), 1.0 / 256, rtol=0.05)
    w3 = np.asarray(he_orthogonal(jax.random.PRNGKey(1), (16, 8, 32)))
    np.testing.assert_allclose(w3.var(), 1.0 / (16 * 8), rtol=0.05)


def test_atom_embedding_parity():
    add_reference_shims()
    import jax
    import torch

    from gemnet.model.layers.embedding_block import AtomEmbedding as RefEmb
    from gemnet_pytorch_tpu.models.layers import AtomEmbedding

    torch.manual_seed(0)
    ref = RefEmb(16)
    Z = np.array([1, 6, 7, 8, 92], np.int32)
    ref_h = ref(torch.tensor(Z, dtype=torch.long)).detach().numpy()

    mine = AtomEmbedding(16)
    v = mine.init(jax.random.PRNGKey(0), Z)
    v = jax.tree_util.tree_map(np.asarray, v)
    v["params"]["embeddings"] = ref.embeddings.weight.detach().numpy()
    h = np.asarray(mine.apply(v, Z))
    np.testing.assert_allclose(h, ref_h, rtol=1e-6, atol=1e-7)


def test_scaling_factor_load_and_apply():
    """Scale multiplies y; values load from the reference JSON by name."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.models.layers import ScalingFactor
    from gemnet_pytorch_tpu.models.scaling import load_scales_from_json

    sf = ScalingFactor("TripInteraction_1_had_rbf")
    x = jnp.ones((4, 3))
    v = sf.init(jax.random.PRNGKey(0), x, x)
    v = dict(v)
    v["scale_factors"] = load_scales_from_json(
        dict(v["scale_factors"]), "/root/reference/pretrained/scaling_factors.json"
    )
    y = sf.apply(v, x, 2.0 * x)
    np.testing.assert_allclose(
        np.asarray(y), 2.0 * 2.9607054591178894, rtol=1e-6
    )
