"""ops-layer tests: masked segment reductions, padded-dense scatter, and the
gradient guards of the geometry primitives (finite grads on padded rows)."""

import numpy as np
import pytest


def test_masked_segment_sum_drops_padded():
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.segment import masked_segment_sum

    data = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    ids = jnp.asarray([0, 0, 1, 2, 0, 0])  # last two are padding pointing at 0
    mask = jnp.asarray([True, True, True, True, False, False])
    out = np.asarray(masked_segment_sum(data, ids, 3, mask=mask))
    expected = np.zeros((3, 2), np.float32)
    expected[0] = data[0] + data[1]
    expected[1] = data[2]
    expected[2] = data[3]
    np.testing.assert_allclose(out, expected)


def test_masked_segment_mean_counts():
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.segment import masked_segment_mean

    data = jnp.asarray([[2.0], [4.0], [6.0], [100.0]])
    ids = jnp.asarray([0, 0, 1, 0])
    mask = jnp.asarray([True, True, True, False])
    out = np.asarray(masked_segment_mean(data, ids, 2, mask=mask))
    np.testing.assert_allclose(out, [[3.0], [6.0]])


def test_scatter_to_padded_dense_roundtrip():
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.segment import scatter_to_padded_dense

    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(0, 5, size=11))
    kidx = np.zeros(11, np.int64)
    for e in np.unique(ids):
        sel = np.nonzero(ids == e)[0]
        kidx[sel] = np.arange(len(sel))
    vals = rng.normal(size=(11, 3)).astype(np.float32)
    out = np.asarray(
        scatter_to_padded_dense(jnp.asarray(vals), jnp.asarray(ids),
                                jnp.asarray(kidx), 5, int(kidx.max()) + 1,
                                mask=np.ones(11, bool))
    )
    for i in range(11):
        np.testing.assert_allclose(out[ids[i], kidx[i]], vals[i])
    # unfilled slots are zero
    total = np.abs(out).sum()
    np.testing.assert_allclose(total, np.abs(vals).sum(), rtol=1e-6)


def test_padded_collisions_add_zero():
    """Padded rows map to slot (0, k); masked values must leave real data
    intact (scatter-add convention)."""
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.segment import scatter_to_padded_dense

    ids = np.array([0, 0, 0])
    kidx = np.array([0, 0, 1])  # rows 1,2 are padding; row 1 collides with row 0
    vals = np.array([[1.0], [99.0], [77.0]], np.float32)
    mask = np.array([True, False, False])
    out = np.asarray(
        scatter_to_padded_dense(jnp.asarray(vals), jnp.asarray(ids),
                                jnp.asarray(kidx), 2, 2, mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(out[0, 0], [1.0])
    np.testing.assert_allclose(out[0, 1], [0.0])


def test_interatomic_vectors_grad_finite_on_padding():
    """Padded self-edges (id_c == id_a) must yield zero, finite gradients —
    the raw sqrt would produce NaN (ops/geometry.py guards)."""
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.geometry import interatomic_vectors

    R = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32))
    id_s = jnp.asarray([0, 1, 0, 0])
    id_t = jnp.asarray([1, 2, 0, 0])  # last two: degenerate padded self-edges
    mask = jnp.asarray([True, True, False, False])

    def f(R):
        D, V = interatomic_vectors(R, id_s, id_t, mask)
        return jnp.sum(D * jnp.asarray([1.0, 1.0, 0.0, 0.0])) + jnp.sum(
            V * jnp.asarray([1.0, 1.0, 0.0, 0.0])[:, None]
        )

    g = np.asarray(jax.grad(f)(R))
    assert np.isfinite(g).all(), g
    # second derivative too (double backward on the force path)
    h = np.asarray(jax.grad(lambda R: jnp.sum(jax.grad(f)(R) ** 2))(R))
    assert np.isfinite(h).all(), h


def test_neighbor_angles_grad_finite_on_collinear():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.geometry import neighbor_angles

    a = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
    b = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 1.0, 0.0]])  # first pair collinear

    def f(a):
        return jnp.sum(neighbor_angles(a, b))

    g = np.asarray(jax.grad(f)(a))
    assert np.isfinite(g).all(), g


def test_vector_rejection_guarded():
    import jax
    import jax.numpy as jnp

    from gemnet_pytorch_tpu.ops.geometry import vector_rejection

    v = jnp.asarray([[1.0, 2.0, 3.0], [1.0, 0.0, 0.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0]])  # second: zero normal

    out = np.asarray(vector_rejection(v, n))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], [1.0, 2.0, 0.0], atol=1e-6)

    g = np.asarray(
        jax.grad(lambda v: jnp.sum(vector_rejection(v, n) ** 2))(v)
    )
    assert np.isfinite(g).all()


def test_down_projection_matches_reference_layout():
    """ops.bilinear.down_projection == reference EfficientInteractionDownProjection
    (matmul + permute; efficient.py:40-57)."""
    import numpy as np

    from gemnet_pytorch_tpu.ops.bilinear import down_projection

    rng = np.random.default_rng(0)
    E, S, R, I = 6, 4, 3, 5
    rbf_env = rng.normal(size=(E, S, R)).astype(np.float32)
    w = rng.normal(size=(S, R, I)).astype(np.float32)
    out = np.asarray(down_projection(rbf_env, w))
    # reference: matmul((S, E, R), (S, R, I)) -> (S, E, I) -> permute (E, I, S)
    ref = np.einsum("ser,sri->sei", np.transpose(rbf_env, (1, 0, 2)), w)
    ref = np.transpose(ref, (1, 2, 0))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
