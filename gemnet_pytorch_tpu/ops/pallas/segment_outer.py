"""Fused segment outer-product reduction — the hot kernel of GemNet on TPU.

Computes, for rows grouped by sorted segment ids (triplets/quadruplets sorted
by their reduce edge, data/padding.py):

    out[s, e, m] = sum_{t : seg(t) == e} a[t, s] * b[t, m]

This replaces the reference's "efficient bilinear" dense construction
(m2[id_reduce, Kidx] = m, sph2[id_reduce, Kidx] = sph; reference
efficient.py:171-189, basis_layers.py:145-162,281-295) and its batched
matmul: on TPU the scatter-built (nEdges, Kmax, ·) blocks are HBM-bandwidth
disasters (~4 ms each at bench shapes), while this kernel streams the sorted
rows once and reduces them onto a small per-block accumulator with S one-hot
MXU contractions. No padded dense ever touches HBM. The output is laid out
(S, nSegments, M) — s-major — so each degree s is a clean (block, M) tile;
the downstream radial contraction consumes it as einsum('eis,sem->eim').

Kernel data layout: row data is staged feature-major ((S, N), (M, N), (1, N))
so every DMA slices the lane dimension at ROW_BLOCK-aligned offsets, which is
what Mosaic's (1,128)/(8,128) tilings require; the wrappers transpose at the
boundary (a cheap XLA transpose vs. multi-ms scatters).

Streaming contract (provided by data/padding.py):
- `seg_ids` sorted ascending, padded rows carry the max id;
- `row_splits[i]` = first row of segment block i (EDGE_BLOCK ids per block);
- rows are streamed in ROW_BLOCK chunks; chunk reads may overhang a block's
  row range — the one-hot filter makes overhang rows contribute zero, so
  alignment rounding is safe.

The backward (`segment_gather_contract`) shares the structure: per segment
block it holds the (S, seg_block, M) cotangent in VMEM and emits

    da[t, s] = sum_m cot[s, seg(t), m] * b[t, m]
    db[t, m] = sum_s cot[s, seg(t), m] * a[t, s]

accumulating into aliased zero-initialized outputs (grid steps run
sequentially on a TPU core, so the boundary-chunk read-modify-writes are
race-free). Both ops carry custom VJPs defined in terms of each other,
closing the recursion so arbitrary-order autodiff works (training needs
grad-of-grad on the energy-derived force path).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

SEG_BLOCK = 32   # segment ids per grid step == data/padding.py EDGE_BLOCK
ROW_BLOCK = 512  # rows per DMA chunk

Implementation = Literal["auto", "pallas", "xla"]


def _precision_for(dtype) -> jax.lax.Precision:
    """MXU contraction precision from the row-data dtype. fp32 inputs get
    HIGHEST: Mosaic runs the multi-pass bf16 decomposition so pallas == the
    exact-VPU XLA fallback (the v5e MXU otherwise rounds inputs to bf16,
    ~3e-3 rel err on hardware, observed by scripts/tpu_checks.py); the
    kernels are DMA/HBM-bound at model shapes so the extra passes are nearly
    free. bf16 inputs (compute_dtype="bfloat16") get DEFAULT — a single MXU
    pass is already exact for bf16 operands. Accumulation is fp32 always."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _use_pallas(impl: Implementation) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    return jax.default_backend() not in ("cpu",)


# ======================================================================
# XLA reference implementations (CPU fallback + correctness oracle)
# ======================================================================


def _outer_sum_xla(a, b, seg_ids, n_segments):
    # fp32 products + accumulation regardless of input dtype (output contract:
    # (S, nSeg, M) float32, matching the Pallas kernels' fp32 accumulators)
    outer = (
        a.astype(jnp.float32)[:, :, None] * b.astype(jnp.float32)[:, None, :]
    ).reshape(a.shape[0], -1)
    out = jax.ops.segment_sum(outer, seg_ids, num_segments=n_segments)
    return out.reshape(n_segments, a.shape[1], b.shape[1]).transpose(1, 0, 2)


def _gather_contract_xla(cot, a, b, seg_ids):
    cot_rows = cot[:, seg_ids, :]  # (S, N, M)
    da = jnp.einsum("stm,tm->ts", cot_rows, b.astype(cot.dtype))
    db = jnp.einsum("stm,ts->tm", cot_rows, a.astype(cot.dtype))
    return da.astype(a.dtype), db.astype(b.dtype)


# ======================================================================
# Pallas kernels (feature-major staging)
# ======================================================================


def _fwd_kernel(splits_ref, packed_ref, out_ref, pk_s, acc, sems,
                *, S, M, Sp, Mp, precision):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    e0 = i * SEG_BLOCK
    start = splits_ref[i]
    end = splits_ref[i + 1]
    start_al = (start // ROW_BLOCK) * ROW_BLOCK
    n_chunks = pl.cdiv(end - start_al, ROW_BLOCK)

    acc[...] = jnp.zeros_like(acc)

    def dma(slot, j):
        row0 = pl.multiple_of(start_al + j * ROW_BLOCK, ROW_BLOCK)
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(row0, ROW_BLOCK)], pk_s.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def body(j, _):
        cur = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < n_chunks)
        def _():
            dma(nxt, j + 1).start()

        dma(cur, j).wait()
        pk = pk_s[cur]
        a_c = pk[:Sp]                        # (Sp, B) — only first S rows real
        b_c = pk[Sp:Sp + Mp]                 # (Mp, B)
        ids = pltpu.bitcast(pk[Sp + Mp : Sp + Mp + 1], jnp.int32)[0]  # (B,)
        # one-hot over the block's segment band; rows outside contribute zero
        sel = (ids[None, :] == e0 + jax.lax.broadcasted_iota(
            jnp.int32, (SEG_BLOCK, ROW_BLOCK), 0)).astype(jnp.float32)
        # stack all degrees into one MXU contraction:
        # weighted[s*W+w, t] = sel[w,t] * a[s,t]
        sel3 = jax.lax.broadcast_in_dim(
            sel, (S, SEG_BLOCK, ROW_BLOCK), (1, 2))
        a3 = jax.lax.broadcast_in_dim(
            a_c[:S], (S, SEG_BLOCK, ROW_BLOCK), (0, 2))
        weighted = (sel3 * a3).reshape(S * SEG_BLOCK, ROW_BLOCK)
        acc[...] += jax.lax.dot_general(
            weighted, b_c[:M], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ).reshape(S, SEG_BLOCK, M)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[...] = acc[...]


def _outer_sum_pallas(a, b, seg_ids, row_splits, n_segments, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, S = a.shape
    M = b.shape[1]
    assert n_segments % SEG_BLOCK == 0, n_segments
    # sublane alignment: feature dims padded to multiples of 8
    Sp = -(-S // 8) * 8
    Mp = -(-M // 8) * 8
    # packed feature-major stream: [a.T ; b.T ; bitcast(ids)] with a tail
    # guard chunk (reads may overhang past the last row)
    pad = ROW_BLOCK
    packed = jnp.zeros((Sp + Mp + 8, n + pad), jnp.float32)
    packed = packed.at[:S, :n].set(a.T.astype(jnp.float32))
    packed = packed.at[Sp : Sp + M, :n].set(b.T.astype(jnp.float32))
    ids_row = jnp.concatenate(
        [seg_ids.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**30))]
    )
    packed = packed.at[Sp + Mp].set(jax.lax.bitcast_convert_type(ids_row, jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_segments // SEG_BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (S, SEG_BLOCK, M), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Sp + Mp + 8, ROW_BLOCK), jnp.float32),
            pltpu.VMEM((S, SEG_BLOCK, M), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, S=S, M=M, Sp=Sp, Mp=Mp, precision=_precision_for(a.dtype)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, n_segments, M), jnp.float32),
        interpret=interpret,
    )(row_splits.astype(jnp.int32), packed)


def _bwd_kernel(splits_ref, ids_ref, a_ref, b_ref, cot_ref, da_in, db_in,
                da_ref, db_ref, a_s, b_s, ids_s, da_s, db_s, sems,
                *, S, M, precision):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    e0 = i * SEG_BLOCK
    start = splits_ref[i]
    end = splits_ref[i + 1]
    start_al = (start // ROW_BLOCK) * ROW_BLOCK
    n_chunks = pl.cdiv(end - start_al, ROW_BLOCK)

    def body(j, _):
        row0 = pl.multiple_of(start_al + j * ROW_BLOCK, ROW_BLOCK)
        copies = [
            pltpu.make_async_copy(a_ref.at[:, pl.ds(row0, ROW_BLOCK)], a_s, sems.at[0]),
            pltpu.make_async_copy(b_ref.at[:, pl.ds(row0, ROW_BLOCK)], b_s, sems.at[1]),
            pltpu.make_async_copy(ids_ref.at[:, pl.ds(row0, ROW_BLOCK)], ids_s, sems.at[2]),
            pltpu.make_async_copy(da_ref.at[:, pl.ds(row0, ROW_BLOCK)], da_s, sems.at[3]),
            pltpu.make_async_copy(db_ref.at[:, pl.ds(row0, ROW_BLOCK)], db_s, sems.at[4]),
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        ids = ids_s[0]
        sel = (ids[None, :] == e0 + jax.lax.broadcasted_iota(
            jnp.int32, (SEG_BLOCK, ROW_BLOCK), 0)).astype(jnp.float32)  # (W, B)
        a_c, b_c = a_s[...], b_s[...]  # (Sp, B), (Mp, B)
        cot_all = cot_ref[...].reshape(S * SEG_BLOCK, M)
        # da[s, t] = sum_w sel[w,t] * (cot @ b)[s*W+w, t]  — one MXU call
        d_swb = jax.lax.dot(
            cot_all, b_c[:M], preferred_element_type=jnp.float32,
            precision=precision,
        ).reshape(S, SEG_BLOCK, ROW_BLOCK)
        sel3 = jax.lax.broadcast_in_dim(
            sel, (S, SEG_BLOCK, ROW_BLOCK), (1, 2))
        da_s[:S] += jnp.sum(sel3 * d_swb, axis=1)
        # db[m, t] = sum_{s,w} cot[s*W+w, m] * sel[w,t]*a[s,t] — one MXU call
        a3 = jax.lax.broadcast_in_dim(
            a_c[:S], (S, SEG_BLOCK, ROW_BLOCK), (0, 2))
        p_all = (sel3 * a3).reshape(S * SEG_BLOCK, ROW_BLOCK)
        db_s[:M] += jax.lax.dot_general(
            cot_all, p_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (M, B)
        wr_a = pltpu.make_async_copy(da_s, da_ref.at[:, pl.ds(row0, ROW_BLOCK)], sems.at[3])
        wr_b = pltpu.make_async_copy(db_s, db_ref.at[:, pl.ds(row0, ROW_BLOCK)], sems.at[4])
        wr_a.start(); wr_b.start()
        wr_a.wait(); wr_b.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _gather_contract_pallas(cot, a, b, seg_ids, row_splits, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, S = a.shape
    M = b.shape[1]
    n_segments = cot.shape[1]
    Sp = -(-S // 8) * 8
    Mp = -(-M // 8) * 8
    pad = ROW_BLOCK
    # kernel streams are fp32 regardless of input dtype (scratch/DMA layout);
    # precision of the MXU contractions follows the ORIGINAL input dtype
    a_k = jnp.zeros((Sp, n + pad), jnp.float32).at[:S, :n].set(
        a.T.astype(jnp.float32))
    b_k = jnp.zeros((Mp, n + pad), jnp.float32).at[:M, :n].set(
        b.T.astype(jnp.float32))
    ids_k = jnp.concatenate(
        [seg_ids.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**30))]
    ).reshape(1, -1)
    da0 = jnp.zeros((Sp, n + pad), jnp.float32)
    db0 = jnp.zeros((Mp, n + pad), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_segments // SEG_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # ids
            pl.BlockSpec(memory_space=pl.ANY),   # a
            pl.BlockSpec(memory_space=pl.ANY),   # b
            pl.BlockSpec(
                (S, SEG_BLOCK, M), lambda i, *_: (0, i, 0), memory_space=pltpu.VMEM
            ),                                    # cot block
            pl.BlockSpec(memory_space=pl.ANY),   # da0 (aliased out)
            pl.BlockSpec(memory_space=pl.ANY),   # db0 (aliased out)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((Sp, ROW_BLOCK), jnp.float32),
            pltpu.VMEM((Mp, ROW_BLOCK), jnp.float32),
            pltpu.VMEM((1, ROW_BLOCK), jnp.int32),
            pltpu.VMEM((Sp, ROW_BLOCK), jnp.float32),
            pltpu.VMEM((Mp, ROW_BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, S=S, M=M, precision=_precision_for(a.dtype)
    )
    da, db = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Sp, n + pad), jnp.float32),
            jax.ShapeDtypeStruct((Mp, n + pad), jnp.float32),
        ),
        input_output_aliases={5: 0, 6: 1},  # da0/db0 (indices incl. prefetch arg)
        interpret=interpret,
    )(row_splits.astype(jnp.int32), ids_k, a_k, b_k, cot, da0, db0)
    # grads must match the primal dtypes (custom-VJP contract)
    return da[:S, :n].T.astype(a.dtype), db[:M, :n].T.astype(b.dtype)


# ======================================================================
# custom-VJP wiring (mutually recursive -> arbitrary-order differentiable)
# ======================================================================


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def segment_outer_sum(a, b, seg_ids, row_splits, n_segments,
                      implementation: Implementation = "auto"):
    """out[s, e, m] = Σ_{t: seg_ids[t]==e} a[t,s]·b[t,m]; seg_ids sorted."""
    if _use_pallas(implementation):
        return _outer_sum_pallas(a, b, seg_ids, row_splits, n_segments)
    return _outer_sum_xla(a, b, seg_ids, n_segments)


def _sos_fwd(a, b, seg_ids, row_splits, n_segments, implementation):
    out = segment_outer_sum(a, b, seg_ids, row_splits, n_segments, implementation)
    return out, (a, b, seg_ids, row_splits)


def _sos_bwd(n_segments, implementation, res, cot):
    a, b, seg_ids, row_splits = res
    da, db = segment_gather_contract(cot, a, b, seg_ids, row_splits, implementation)
    return da, db, None, None


segment_outer_sum.defvjp(_sos_fwd, _sos_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def segment_gather_contract(cot, a, b, seg_ids, row_splits,
                            implementation: Implementation = "auto"):
    """(da, db): da[t,s]=Σ_m cot[s,seg,m]·b[t,m]; db[t,m]=Σ_s cot[s,seg,m]·a[t,s]."""
    if _use_pallas(implementation):
        return _gather_contract_pallas(cot, a, b, seg_ids, row_splits)
    return _gather_contract_xla(cot, a, b, seg_ids)


def _sgc_fwd(cot, a, b, seg_ids, row_splits, implementation):
    out = segment_gather_contract(cot, a, b, seg_ids, row_splits, implementation)
    return out, (cot, a, b, seg_ids, row_splits)


def _sgc_bwd(implementation, res, cots):
    cot, a, b, seg_ids, row_splits = res
    ua, ub = cots
    n_segments = cot.shape[1]
    dcot = segment_outer_sum(
        ua, b, seg_ids, row_splits, n_segments, implementation
    ) + segment_outer_sum(a, ub, seg_ids, row_splits, n_segments, implementation)
    da, db = segment_gather_contract(cot, ua, ub, seg_ids, row_splits, implementation)
    return dcot, da, db, None, None


segment_gather_contract.defvjp(_sgc_fwd, _sgc_bwd)
