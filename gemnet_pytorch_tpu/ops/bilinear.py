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

from .segment import scatter_to_padded_dense


def down_projection(rbf_env: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Per-order radial down-projection (reference efficient.py:40-57).

    rbf_env: (nEdges, S, R); weight: (S, R, I) -> (nEdges, I, S)
    """
    return jnp.einsum("esr,sri->eis", rbf_env, weight)


def bilinear(
    rbf_W1: jnp.ndarray,
    sph: jnp.ndarray,
    m: jnp.ndarray,
    id_reduce: jnp.ndarray,
    kidx: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Bilinear contraction + neighbor summation (reference efficient.py:159-189).

    rbf_W1: (nEdges, I, S) down-projected radial basis
    sph: (nEdges, Kmax, S) zero-padded spherical values
    m: (nTriplets, emb) grouped neighbor messages (sorted by id_reduce)
    weight: (emb, I, out)
    returns (nEdges, out)
    """
    n_edges, kmax, _ = sph.shape
    m2 = scatter_to_padded_dense(m, id_reduce, kidx, n_edges, kmax, mask=mask)
    # (E, S, K) @ (E, K, M) -> (E, S, M)
    sum_k = jnp.einsum("eks,ekm->esm", sph, m2)
    # (E, I, S) @ (E, S, M) -> (E, I, M)
    rbf_w1_sum_k = jnp.einsum("eis,esm->eim", rbf_W1, sum_k)
    # contract (I, M) with weight (M, I, O)
    return jnp.einsum("eim,mio->eo", rbf_w1_sum_k, weight)
