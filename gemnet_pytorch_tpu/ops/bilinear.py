"""Efficient bilinear basis contraction — the FLOP/memory-critical op.

This is the TPU formulation of the reference's
EfficientInteractionBilinear (gemnet/model/layers/efficient.py:120-189):
instead of materializing per-triplet/quadruplet basis outer products, the
grouped neighbor messages are scattered into a zero-padded dense
(nEdges, Kmax, emb) block and the contraction runs as three batched matmuls
that map straight onto the MXU:

    sum_k[e,s,m]   = Σ_k  sph[e,k,s] · m2[e,k,m]        (nEdges batched GEMM)
    rbfW_sum[e,i,m]= Σ_s  rbf_W1[e,i,s] · sum_k[e,s,m]  (nEdges batched GEMM)
    out[e,o]       = Σ_{i,m} rbfW_sum[e,i,m] · W2[m,i,o]

Kmax is static (a pad dim), so XLA tiles these onto the systolic array; the
scatter is a single masked segment-sum (ops/segment.py). A fused Pallas
variant lives in ops/pallas (the padded-dense never hits HBM there).
"""

from __future__ import annotations

import jax.numpy as jnp

from .pallas.segment_outer import segment_outer_sum


def down_projection(rbf_env: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Per-order radial down-projection (reference efficient.py:40-57).

    rbf_env: (nEdges, S, R); weight: (S, R, I) -> (nEdges, I, S)
    """
    return jnp.einsum("esr,sri->eis", rbf_env, weight)


def bilinear(
    rbf_W1: jnp.ndarray,
    sph_rows: jnp.ndarray,
    m: jnp.ndarray,
    id_reduce: jnp.ndarray,
    row_splits: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    implementation: str = "auto",
    seg_block: int | None = None,
) -> jnp.ndarray:
    """Bilinear contraction + neighbor summation (reference efficient.py:159-189).

    The reference scatters grouped messages into a zero-padded
    (nEdges, Kmax, emb) dense and runs three batched matmuls; here the
    neighbor sum  sum_k[s,e,m] = Σ_t sph[t,s]·m[t,m]  runs as one fused
    segment-outer-sum (Pallas on TPU, ops/pallas/segment_outer.py), then two
    MXU einsums finish the contraction.

    rbf_W1: (nEdges, I, S) down-projected radial basis
    sph_rows: (nTriplets, S) per-row spherical values (sorted by id_reduce)
    m: (nTriplets, emb) grouped neighbor messages (sorted by id_reduce)
    weight: (emb, I, out)
    returns (nEdges, out)
    """
    n_edges = rbf_W1.shape[0]
    if mask is not None:
        m = m * mask.astype(m.dtype)[:, None]
    sum_k = segment_outer_sum(
        sph_rows, m, id_reduce, row_splits, n_edges, implementation, seg_block
    )  # (S, E, M) — always fp32 accumulated
    # finish in the compute dtype (bf16 mode keeps these on the fast MXU path)
    sum_k = sum_k.astype(rbf_W1.dtype)
    # (E, I, S) @ (S, E, M) -> (E, I, M)
    rbf_w1_sum_k = jnp.einsum("eis,sem->eim", rbf_W1, sum_k)
    # contract (I, M) with weight (M, I, O)
    return jnp.einsum("eim,mio->eo", rbf_w1_sum_k, weight)


def hadamard(
    rbf_W1: jnp.ndarray,
    sph_rows: jnp.ndarray,
    m: jnp.ndarray,
    id_reduce: jnp.ndarray,
    row_splits: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    implementation: str = "auto",
    seg_block: int | None = None,
) -> jnp.ndarray:
    """Efficient hadamard + summation — reformulation of the reference's
    EfficientInteractionHadamard (efficient.py:60-117; defined there but
    unused by the released models, kept for capability parity).

    weight: (emb, 1, interm);  out[e, emb] = Σ_i weight[emb, 0, i] ·
    Σ_s rbf_W1[e, i, s] · sum_k[s, e, emb].
    """
    n_edges = rbf_W1.shape[0]
    if mask is not None:
        m = m * mask.astype(m.dtype)[:, None]
    sum_k = segment_outer_sum(
        sph_rows, m, id_reduce, row_splits, n_edges, implementation, seg_block
    )  # (S, E, M) — always fp32 accumulated
    sum_k = sum_k.astype(rbf_W1.dtype)
    inner = jnp.einsum("eis,sem->eim", rbf_W1, sum_k)
    return jnp.einsum("eim,mi->em", inner, weight[:, 0, :])
