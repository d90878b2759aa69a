"""Parameter initializers (reference gemnet/model/initializers.py).

he_orthogonal: random (semi-)orthogonal matrix, standardized to unit variance
/ zero mean, scaled by sqrt(1/fan_in). The reference tensors are torch Linear
kernels of shape (out, in) with fan_in = in (2D) and (d0, d1, out) with
fan_in = d0*d1 (3D, reference initializers.py:31-34); flax kernels are
(in, out), so the 2D path orthogonalizes the transposed shape and flips back
to keep the distribution identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _standardize(kernel: jnp.ndarray, axis) -> jnp.ndarray:
    eps = 1e-6
    var = jnp.var(kernel, axis=axis, keepdims=True, ddof=1)
    mean = jnp.mean(kernel, axis=axis, keepdims=True)
    return (kernel - mean) / jnp.sqrt(var + eps)


def he_orthogonal(key, shape, dtype=jnp.float32) -> jnp.ndarray:
    """For flax 2D kernels (in, out) and 3D weights (d0, d1, out)."""
    if len(shape) == 2:
        fan_in = shape[0]
        w = jax.nn.initializers.orthogonal(column_axis=0)(key, (shape[1], shape[0]), dtype)
        w = _standardize(w, axis=1).T
    elif len(shape) == 3:
        fan_in = shape[0] * shape[1]
        flat = (shape[0], shape[1] * shape[2])
        w = jax.nn.initializers.orthogonal(column_axis=1)(key, flat, dtype)
        w = w.reshape(shape)
        w = _standardize(w, axis=(0, 1))
    else:
        raise ValueError(f"unsupported shape {shape}")
    return w * jnp.sqrt(1.0 / fan_in).astype(dtype)


def atom_embedding_init(key, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-sqrt(3), sqrt(3)) (reference embedding_block.py:22-24)."""
    s = jnp.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, minval=-s, maxval=s)
