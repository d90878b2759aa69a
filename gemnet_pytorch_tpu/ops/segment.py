"""Masked segment reductions — the TPU replacement for torch_scatter.

All edge->atom, triplet->edge, quad->edge, atom->molecule reductions in the
reference are `torch_scatter.scatter(..., reduce="add"|"mean")`
(reference gemnet.py:580-596, atom_update_block.py:67). Here they are
jax segment_sums over **in-bounds** ids with mask-zeroed sources — the
padding convention of data/padding.py — which XLA lowers to efficient sorted
scatters; the Pallas kernels in ops/pallas provide the tuned path for the
sorted layouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """segment-sum with padded rows contributing exact zeros.

    Accumulates in (at least) fp32: bf16 inputs (compute_dtype="bfloat16")
    are upcast before the reduction — long per-atom sums in bf16 lose
    mantissa — and the result is returned in fp32."""
    acc_dtype = jnp.promote_types(data.dtype, jnp.float32)
    data = data.astype(acc_dtype)
    if mask is not None:
        data = data * mask.astype(data.dtype).reshape((-1,) + (1,) * (data.ndim - 1))
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def masked_segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """segment-mean over real rows only (count from mask, clamped to >=1)."""
    total = masked_segment_sum(data, segment_ids, num_segments, mask)
    ones = (
        mask.astype(total.dtype)
        if mask is not None
        else jnp.ones(data.shape[0], total.dtype)
    )
    counts = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    counts = jnp.maximum(counts, 1.0)
    return total / counts.reshape((-1,) + (1,) * (data.ndim - 1))


def scatter_to_padded_dense(
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    kidx: jnp.ndarray,
    num_segments: int,
    kmax: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scatter grouped rows into a zero-padded dense (num_segments, kmax, F).

    The reference builds this with `m2[id_reduce, Kidx] = m`
    (efficient.py:174-175, basis_layers.py:155-160,286-292). Here it is a
    scatter-**add** (each real (segment, k) slot is hit exactly once; padded
    rows are zeroed by the mask so their colliding writes at slot (0, k)
    contribute nothing).
    """
    if mask is not None:
        values = values * mask.astype(values.dtype).reshape(
            (-1,) + (1,) * (values.ndim - 1)
        )
    flat_ids = segment_ids.astype(jnp.int32) * kmax + kidx.astype(jnp.int32)
    out = jax.ops.segment_sum(values, flat_ids, num_segments=num_segments * kmax)
    return out.reshape((num_segments, kmax) + values.shape[1:])
