"""Fused segment outer-product reduction — the hot kernel of GemNet on TPU.

Computes, for rows grouped by sorted segment ids (triplets/quadruplets sorted
by their reduce edge, data/padding.py):

    out[s, e, m] = sum_{t : seg(t) == e} a[t, s] * b[t, m]

This replaces the reference's "efficient bilinear" dense construction
(m2[id_reduce, Kidx] = m, sph2[id_reduce, Kidx] = sph; reference
efficient.py:171-189, basis_layers.py:145-162,281-295) and its batched
matmul: on TPU the scatter-built (nEdges, Kmax, ·) blocks are HBM-bandwidth
disasters (~4 ms each at bench shapes), while this kernel streams the sorted
rows once and reduces them onto a small per-block accumulator with one-hot
MXU contractions. No padded dense ever touches HBM. The output is laid out
(S, nSegments, M) — s-major, so a W-segment block is one lane-aligned
(S, W·M) DMA slice of the flattened view; the downstream radial contraction
consumes it as einsum('eis,sem->eim').

Cost model / block sizing: the one-hot contraction does S·W·M MXU MACs per
row for S·M useful ones — the FLOP amplification IS the segment-block width
W. The round-1 kernels fixed W=32 and were MXU-bound at quad shapes (24
quad-kernel calls ≈ 60% of the train step in the jax.profiler trace, round
2). `_choose_blocks` now picks the smallest W ∈ {8,16,32} whose expected
rows-per-grid-step (W · n/nSegments) still covers half a DMA chunk, so
row-dense spaces (quadruplets: ~65 rows/edge ⇒ W=8) get a 4x MXU-work cut
while row-sparse spaces (triplets: ~9 rows/edge ⇒ W=32) keep wide blocks and
avoid re-reading mostly-empty chunks. (The backward additionally rounds W up
until W·M is a lane-tile multiple — its cotangent DMA slices lanes.)

Kernel data layout: row data is staged feature-major ((S, N), (M, N), int32
(1, N) ids) so every DMA slices the lane dimension at ROW_BLOCK-aligned
offsets, which is what Mosaic's tilings require; the wrappers transpose at
the boundary (a cheap XLA transpose vs. multi-ms scatters; XLA CSEs the
repeated stagings of the same operand across a train step's ~48 calls). In
bf16 mode (compute_dtype="bfloat16") the streams are staged AND contracted
in bf16 — half the HBM traffic, single-pass MXU — while accumulation and
the forward outputs stay fp32.

Forward kernel (`segment_outer_sum`): grid over segment blocks of W ids;
each step streams its row range in double-buffered ROW_BLOCK chunks and
reduces onto a VMEM accumulator. Per-step row ranges (splits at W-segment
boundaries) are computed in-graph by a tiny `jnp.searchsorted` over the
sorted ids, so W is a free kernel parameter, decoupled from the host-side
EDGE_BLOCK batch layout. The `row_splits` argument of the public ops is
kept as part of the batch layout contract (the ep partitioner and layout
tests rely on it) but the kernels no longer consume it.

Backward kernel (`segment_gather_contract`) emits

    da[t, s] = sum_m cot[s, seg(t), m] * b[t, m]
    db[t, m] = sum_s cot[s, seg(t), m] * a[t, s]

with the INVERTED loop order: the grid runs over row chunks (each output
column is owned by exactly one grid step — written once, no read-modify-
write, and Pallas pipelines the a/b/ids/da/db blocks automatically), and a
data-dependent inner loop DMAs the few small (S, W·M) cotangent slices the
chunk's rows actually reference. The round-1 version gridded over segment
blocks like the forward and paid 2x its streaming in zero-init + read-
modify-write traffic on the da/db accumulator streams — the dominant cost
of the whole train step in the round-2 profile. The contractions run as

    da_chunk[s, t] = Σ_wm cot2[s, wm] · (sel[w,t]·b[m,t])   (K = W·M)
    db_chunk[m, t] = Σ_w  sel[w,t] · G[(w,m), t],
        G = Σ_s cot2[s, wm] · a[s, t]                       (K = S)

— both contract over long K dims, so the MXU utilization is strictly
better than the forward's one-hot form.

Both ops carry custom VJPs defined in terms of each other, closing the
recursion so arbitrary-order autodiff works (training needs grad-of-grad on
the energy-derived force path).
"""

from __future__ import annotations

import functools
import math
from typing import Literal

import jax
import jax.numpy as jnp

ROW_BLOCK = 512  # rows per DMA chunk / backward grid step
SEG_BLOCK_CHOICES = (4, 8, 16, 32)  # admissible segment-block widths
_HEURISTIC_CHOICES = (8, 16, 32)  # widths the density heuristic considers (4
# doubles the forward grid's step count for marginal FLOP savings — only
# reachable as an explicit override / the backward's own choice)
LANE = 128

Implementation = Literal["auto", "pallas", "xla"]

# Trace-time call log for the analytic roofline (perf/roofline.py): when a
# list, every Pallas kernel construction appends its static shape/W record —
# jit traces each call site once, so tracing a step with this enabled yields
# the exact kernel-call census of the compiled program.
TRACE_LOG: list | None = None


def _log_call(kind: str, **kw):
    if TRACE_LOG is not None:
        TRACE_LOG.append(dict(kind=kind, **kw))


def _choose_blocks(
    n_rows: int, n_segments: int, seg_block: int | None = None
) -> tuple[int, int]:
    """(W, ROW_BLOCK): smallest segment-block width whose expected rows per
    block (W · mean rows/segment) covers >= half a DMA chunk. W is the MXU
    FLOP amplification factor, so smaller is better wherever the DMA stream
    stays dense.

    `seg_block` overrides the heuristic with a host-chosen W computed from
    REAL row densities (data/padding.py chooses it at PadDims-estimation
    time and carries it per batch): the padded n_rows/n_segments here
    over-state density after an outlier batch grows the pad dims, silently
    amplifying MXU work."""
    if seg_block:
        assert seg_block in SEG_BLOCK_CHOICES, seg_block
        return seg_block, ROW_BLOCK
    rows_per_seg = max(n_rows // max(n_segments, 1), 1)
    for w in _HEURISTIC_CHOICES:
        if w * rows_per_seg >= ROW_BLOCK // 2:
            return w, ROW_BLOCK
    return _HEURISTIC_CHOICES[-1], ROW_BLOCK


def _bwd_seg_block(
    n_rows: int, n_segments: int, M: int, seg_block: int | None = None
) -> int | None:
    """Backward W: chosen INDEPENDENTLY of the forward's width. The round-4
    hardware sweep (scripts/kernel_bench.py) shows the backward favors the
    narrowest admissible block — its per-block costs (the (S, W·M) cotangent
    DMA and the (W·M, RB) db intermediate) scale with W while its matmul
    K-dims stay long either way: quad shapes (M=32) run 3.10 ms at W=4 vs
    3.56 at the forward's W=8; trip shapes (M=64) 2.92-3.00 ms at W=4-8 vs
    3.28 at the forward's W=32. First W in SEG_BLOCK_CHOICES that is
    lane-aligned ((W·M) % 128 == 0, the cotangent DMA slices the lane dim of
    the (S, nSeg·M) view) and divides n_segments; None if none does (caller
    falls back to XLA). The fwd-oriented `seg_block` override is ignored."""
    del seg_block
    for w in SEG_BLOCK_CHOICES:
        if (w >= LANE // math.gcd(M, LANE) and (w * M) % LANE == 0
                and w <= n_segments and n_segments % w == 0):
            return w
    return None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _stream_dtype(*arrays) -> jnp.dtype:
    """bf16 streams iff every row-data input is bf16 (compute_dtype mode);
    fp32 otherwise. Accumulation is fp32 always."""
    if all(jnp.dtype(x.dtype) == jnp.bfloat16 for x in arrays):
        return jnp.dtype(jnp.bfloat16)
    return jnp.dtype(jnp.float32)


# Manual 3-pass fp32 mode ("split3"): Mosaic's dot lowering has no
# Precision.HIGH (only DEFAULT / 6-pass HIGHEST — verified on hardware,
# round 5), so the classic bf16x3 decomposition is built by hand: each fp32
# stream is staged as hi = bf16(x) plus lo = bf16(x - hi) — SAME total DMA
# bytes as fp32 — and every data-data contraction runs as three
# DEFAULT-precision MXU passes  a_hi.b_hi + a_hi.b_lo + a_lo.b_hi  with
# fp32 accumulation: ~2x the fp32-HIGHEST MXU rate at ~1e-6 rel err
# (vs ~1e-7). Applies ONLY to the bilinear segment kernels; the geometry
# segsums (ops/pallas/expand_gather.py) stay exact — they sit on the force
# path's double backward. Opt-in: ModelConfig.matmul_precision="high"
# (models.make_model sets the process-wide flag; the XLA fallback path
# stays exact fp32, so CPU tests and reference parity are unaffected).
FP32_SPLIT3 = False


def set_fp32_split3(on: bool) -> None:
    """Enable/disable the 3-pass fp32 kernel mode process-wide (affects
    traces made after the call). See the FP32_SPLIT3 comment."""
    global FP32_SPLIT3
    FP32_SPLIT3 = bool(on)


def _use_split3(sdt) -> bool:
    return FP32_SPLIT3 and jnp.dtype(sdt) == jnp.float32


def _split_hi_lo(x):
    """f32 -> (bf16 hi, bf16 lo) with hi + lo covering ~16 mantissa bits.

    The split is done by MASKING the low mantissa bits, not by a
    bf16-roundtrip: XLA's algebraic simplifier elides f32(bf16(x)) as a
    no-op convert pair, which silently turned lo into x - x = 0 on hardware
    (the 3-pass collapsed to single-pass bf16, rel err 3e-3 — caught by the
    round-5 hardware check). The masked hi keeps sign+exponent+7 mantissa
    bits, exactly representable in bf16; lo = x - hi is exact in f32 and
    its bf16 rounding carries ~8 more bits."""
    xf = x.astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        xi & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)  # exact (mantissa already truncated)
    lo = (xf - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _out_dtype(sdt) -> jnp.dtype:
    """Forward-output dtype: bf16 when the streams are bf16 (the consumers —
    bilinear's 'eis,sem->eim' einsum, the expand-gather backward — cast the
    fp32 accumulator output to bf16 immediately anyway; rounding at the
    kernel store is bit-identical and halves the output write+read traffic,
    ~2 ms/step at bench shapes, round-5 trace). Accumulation stays fp32 in
    VMEM; fp32 streams keep fp32 outputs."""
    return (
        jnp.dtype(jnp.bfloat16)
        if jnp.dtype(sdt) == jnp.bfloat16
        else jnp.dtype(jnp.float32)
    )


def _precision_for(sdt) -> jax.lax.Precision:
    """MXU contraction precision from the stream dtype. fp32 streams get
    HIGHEST: Mosaic runs the multi-pass bf16 decomposition so pallas == the
    exact-VPU XLA fallback (the v5e MXU otherwise rounds inputs to bf16,
    ~3e-3 rel err on hardware, observed by scripts/tpu_checks.py). bf16
    streams get DEFAULT — a single MXU pass is already exact for bf16
    operands.

    (Round-5 note: a 3-pass middle mode via Precision.HIGH is NOT
    available — Mosaic's dot lowering supports only DEFAULT and HIGHEST
    ('Unsupported dot precision: HIGH', verified on hardware); a faster
    fp32 mode needs the manual hi/lo bf16-split 3-pass decomposition.)"""
    if jnp.dtype(sdt) != jnp.float32:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGHEST


def _fine_splits(seg_ids, n_segments: int, w: int):
    """First-row index for every W segment ids, computed in-graph (sorted
    input; XLA CSEs the duplicates across a train step's kernel calls).

    method="scan_unrolled": jnp.searchsorted's default 'scan' method lowers
    to a serial lax.scan while-loop that cost ~1.9 ms/step on the bench quad
    space (round-5 trace, %while.314); the unrolled binary search is log2(n)
    tiny vectorized gathers instead (~0.01 ms)."""
    bounds = jnp.arange(0, n_segments + w, w, dtype=jnp.int32)
    return jnp.searchsorted(
        seg_ids.astype(jnp.int32), bounds, side="left",
        method="scan_unrolled",
    ).astype(jnp.int32)


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
    # (S, nSeg, M) in _out_dtype(streams) — fp32, or bf16 rounded at store
    # for bf16 streams, matching the Pallas kernels' fp32 VMEM accumulators)
    outer = (
        a.astype(jnp.float32)[:, :, None] * b.astype(jnp.float32)[:, None, :]
    ).reshape(a.shape[0], -1)
    out = jax.ops.segment_sum(outer, seg_ids, num_segments=n_segments)
    out = out.reshape(n_segments, a.shape[1], b.shape[1]).transpose(1, 0, 2)
    return out.astype(_out_dtype(_stream_dtype(a, b)))


def _gather_contract_xla(cot, a, b, seg_ids):
    cot_rows = cot[:, seg_ids, :]  # (S, N, M)
    da = jnp.einsum("stm,tm->ts", cot_rows, b.astype(cot.dtype))
    db = jnp.einsum("stm,ts->tm", cot_rows, a.astype(cot.dtype))
    return da.astype(a.dtype), db.astype(b.dtype)


# ======================================================================
# Pallas kernels (feature-major staging)
# ======================================================================


def _fwd_kernel(splits_ref, ids_ref, a_ref, b_ref, out_ref,
                a_s, b_s, ids_s, acc, sems, *, S, M, W, RB, precision, sdt,
                split3=False, SpH=0, MpH=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    e0 = i * W
    start = splits_ref[i]
    end = splits_ref[i + 1]
    start_al = (start // RB) * RB
    n_chunks = pl.cdiv(end - start_al, RB)

    acc[...] = jnp.zeros_like(acc)

    def dmas(slot, j):
        row0 = pl.multiple_of(start_al + j * RB, RB)
        return (
            pltpu.make_async_copy(
                a_ref.at[:, pl.ds(row0, RB)], a_s.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                b_ref.at[:, pl.ds(row0, RB)], b_s.at[slot], sems.at[slot, 1]
            ),
            pltpu.make_async_copy(
                ids_ref.at[:, pl.ds(row0, RB)], ids_s.at[slot], sems.at[slot, 2]
            ),
        )

    @pl.when(n_chunks > 0)
    def _():
        for cp in dmas(0, 0):
            cp.start()

    def body(j, _):
        cur = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < n_chunks)
        def _():
            for cp in dmas(nxt, j + 1):
                cp.start()

        for cp in dmas(cur, j):
            cp.wait()
        ids = ids_s[cur, 0]
        # one-hot over the block's segment band; rows outside contribute zero
        sel = (ids[None, :] == e0 + jax.lax.broadcasted_iota(
            jnp.int32, (W, RB), 0)).astype(sdt)
        # Z-form contraction (same as the backward's da path): materialize
        # the (W·M, RB) selected-b operand once and contract the a-stream
        # against it — out[s, (w,m)] = Σ_t a[s,t] · sel[w,t]·b[m,t]. One
        # broadcast-multiply of W·M·RB elements (vs the round-3 form's two
        # of S·W·RB) and an MXU output of W·M lanes (256 at quad shapes,
        # fully tiled) instead of M (32, a quarter-tile).
        # (scripts/kernel_bench.py sweeps this on hardware.)
        selM = jax.lax.broadcast_in_dim(sel, (W, M, RB), (0, 2))

        def contract(a2, z2):
            # acc/out stay (S, W·M): splitting the 2048-lane dim into
            # (W, M) inside the kernel is an unsupported Mosaic relayout;
            # the wrapper reshapes the contiguous (S, nSeg·M) output free
            return jax.lax.dot_general(
                a2, z2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )

        if split3:
            # manual 3-pass fp32 (see FP32_SPLIT3): hi/lo halves live at
            # row offsets 0 / SpH (MpH) of the bf16-staged streams
            ah, al = a_s[cur, :S], a_s[cur, SpH:SpH + S]
            bh = jax.lax.broadcast_in_dim(b_s[cur, :M], (W, M, RB), (1, 2))
            bl = jax.lax.broadcast_in_dim(
                b_s[cur, MpH:MpH + M], (W, M, RB), (1, 2))
            zh = (selM * bh).reshape(W * M, RB)
            zl = (selM * bl).reshape(W * M, RB)
            acc[...] += contract(ah, zh) + contract(ah, zl) + contract(al, zh)
        else:
            b3 = jax.lax.broadcast_in_dim(b_s[cur, :M], (W, M, RB), (1, 2))
            z = (selM * b3).reshape(W * M, RB)
            acc[...] += contract(a_s[cur, :S], z)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[...] = acc[...].astype(out_ref.dtype)


def _outer_sum_pallas(a, b, seg_ids, row_splits, n_segments, seg_block=None,
                      interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, S = a.shape
    M = b.shape[1]
    sdt = _stream_dtype(a, b)
    split3 = _use_split3(sdt)
    kdt = jnp.dtype(jnp.bfloat16) if split3 else sdt  # staged dtype
    sub = 16 if kdt == jnp.bfloat16 else 8  # sublane tile for the stage dtype
    W, RB = _choose_blocks(n, n_segments, seg_block)
    assert n_segments % W == 0, (n_segments, W)
    _log_call("fwd", n=n, S=S, M=M, n_segments=n_segments, W=W, RB=RB,
              dtype=("split3" if split3 else str(sdt)))
    Sp = _round_up(S, sub)
    Mp = _round_up(M, sub)
    # feature-major streams with a tail guard chunk (reads may overhang);
    # split3 stacks the bf16 hi half at rows [0:S] and the lo half at
    # [Sp:Sp+S] — same total bytes as the fp32 staging it replaces
    pad = RB
    SpA = 2 * Sp if split3 else Sp
    MpA = 2 * Mp if split3 else Mp
    if split3:
        ah, al = _split_hi_lo(a.T)
        bh, bl = _split_hi_lo(b.T)
        a_k = (jnp.zeros((SpA, n + pad), kdt)
               .at[:S, :n].set(ah).at[Sp:Sp + S, :n].set(al))
        b_k = (jnp.zeros((MpA, n + pad), kdt)
               .at[:M, :n].set(bh).at[Mp:Mp + M, :n].set(bl))
    else:
        a_k = jnp.zeros((SpA, n + pad), kdt).at[:S, :n].set(a.T.astype(kdt))
        b_k = jnp.zeros((MpA, n + pad), kdt).at[:M, :n].set(b.T.astype(kdt))
    ids_k = jnp.concatenate(
        [seg_ids.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**30))]
    ).reshape(1, -1)
    splits = _fine_splits(seg_ids, n_segments, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_segments // W,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids
            pl.BlockSpec(memory_space=pl.ANY),  # a
            pl.BlockSpec(memory_space=pl.ANY),  # b
        ],
        out_specs=pl.BlockSpec(
            (S, W * M), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SpA, RB), kdt),
            pltpu.VMEM((2, MpA, RB), kdt),
            pltpu.VMEM((2, 1, RB), jnp.int32),
            pltpu.VMEM((S, W * M), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, S=S, M=M, W=W, RB=RB,
        precision=(jax.lax.Precision.DEFAULT if split3
                   else _precision_for(sdt)),
        sdt=kdt, split3=split3, SpH=Sp, MpH=Mp,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, n_segments * M), _out_dtype(sdt)),
        interpret=interpret,
    )(splits, ids_k, a_k, b_k)
    return out.reshape(S, n_segments, M)


def _bwd_kernel(blo_ref, bhi_ref, ids_ref, a_ref, b_ref, cot_ref,
                da_ref, db_ref, cot_s, da_acc, db_acc, sems,
                *, S, M, W, RB, precision, sdt, split3=False, SpH=0, MpH=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    ids = ids_ref[0]
    a_c = a_ref[...]
    b_c = b_ref[...]
    da_acc[...] = jnp.zeros_like(da_acc)
    db_acc[...] = jnp.zeros_like(db_acc)
    blo = blo_ref[j]
    bhi = bhi_ref[j]

    # double-buffered (S, W·M) cotangent slices: the round-3 kernel issued
    # start();wait() back-to-back per referenced block, paying full DMA
    # latency on the critical path of every inner iteration; prefetching
    # block w+1 while contracting block w hides it (the a/b/ids streams are
    # already pipelined by their BlockSpecs)
    def dma(w):
        slot = jax.lax.rem(w, 2)
        return pltpu.make_async_copy(
            cot_ref.at[:, pl.ds(w * (W * M), W * M)], cot_s.at[slot],
            sems.at[slot],
        )

    @pl.when(blo < bhi)
    def _():
        dma(blo).start()

    def body(w, _):
        @pl.when(w + 1 < bhi)
        def _():
            dma(w + 1).start()

        dma(w).wait()
        sel = (ids[None, :] == w * W + jax.lax.broadcasted_iota(
            jnp.int32, (W, RB), 0)).astype(sdt)  # (W, B)
        sel_wm = jax.lax.broadcast_in_dim(sel, (W, M, RB), (0, 2))
        slot = jax.lax.rem(w, 2)

        def dot_k(x, y):  # contract over the shared K (axis 1 of both)
            return jax.lax.dot(
                x, y, preferred_element_type=jnp.float32,
                precision=precision)

        def dot_s(x, y):  # contract over axis 0 of both (K = S)
            return jax.lax.dot_general(
                x, y, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)

        if split3:
            # manual 3-pass fp32 (FP32_SPLIT3): hi/lo at row offsets 0/SpH
            c2h, c2l = cot_s[slot, :S], cot_s[slot, SpH:SpH + S]
            bh = jax.lax.broadcast_in_dim(b_c[:M], (W, M, RB), (1, 2))
            bl = jax.lax.broadcast_in_dim(
                b_c[MpH:MpH + M], (W, M, RB), (1, 2))
            p2h = (sel_wm * bh).reshape(W * M, RB)
            p2l = (sel_wm * bl).reshape(W * M, RB)
            # da[s, t] = Σ_wm cot2[s, wm] · sel[w,t]·b[m,t]  (K = W·M)
            da_acc[:S] += (dot_k(c2h, p2h) + dot_k(c2h, p2l)
                           + dot_k(c2l, p2h))
            # G[(w,m), t] = Σ_s cot2[s, wm] · a[s, t]  (K = S)
            ah, al = a_c[:S], a_c[SpH:SpH + S]
            g = (dot_s(c2h, ah) + dot_s(c2h, al)
                 + dot_s(c2l, ah)).reshape(W, M, RB)
        else:
            cot2 = cot_s[slot, :S]  # (S, W*M)
            # da[s, t] = Σ_wm cot2[s, wm] · sel[w,t]·b[m,t]  (K = W·M)
            b3 = jax.lax.broadcast_in_dim(b_c[:M], (W, M, RB), (1, 2))
            p2 = (sel_wm * b3).reshape(W * M, RB)
            da_acc[:S] += dot_k(cot2, p2)  # (S, B)
            # G[(w,m), t] = Σ_s cot2[s, wm] · a[s, t]  (K = S), then
            # db[m, t] = Σ_w sel[w,t] · G[(w,m), t]
            g = dot_s(cot2, a_c[:S]).reshape(W, M, RB)
        sel_f = jax.lax.broadcast_in_dim(
            sel.astype(jnp.float32), (W, M, RB), (0, 2))
        db_acc[:M] += jnp.sum(sel_f * g, axis=0)  # (M, B)
        return 0

    jax.lax.fori_loop(blo, bhi, body, 0)
    da_ref[...] = da_acc[...].astype(da_ref.dtype)
    db_ref[...] = db_acc[...].astype(db_ref.dtype)


def _gather_contract_pallas(cot, a, b, seg_ids, row_splits, seg_block=None,
                            interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, S = a.shape
    M = b.shape[1]
    n_segments = cot.shape[1]
    sdt = _stream_dtype(a, b)
    split3 = _use_split3(sdt)
    kdt = jnp.dtype(jnp.bfloat16) if split3 else sdt
    sub = 16 if kdt == jnp.bfloat16 else 8
    W = _bwd_seg_block(n, n_segments, M, seg_block)
    if W is None:  # no lane-aligned W divides n_segments (exotic shapes)
        return _gather_contract_xla(cot, a, b, seg_ids)
    RB = ROW_BLOCK
    _log_call("bwd", n=n, S=S, M=M, n_segments=n_segments, W=W, RB=RB,
              dtype=("split3" if split3 else str(sdt)))
    Sp = _round_up(S, sub)
    Mp = _round_up(M, sub)
    n_pad = _round_up(n, RB)
    grid = n_pad // RB
    SpA = 2 * Sp if split3 else Sp  # staged height (hi/lo halves stacked)
    MpA = 2 * Mp if split3 else Mp
    if split3:
        ah, al = _split_hi_lo(a.T)
        bh, bl = _split_hi_lo(b.T)
        a_k = (jnp.zeros((SpA, n_pad), kdt)
               .at[:S, :n].set(ah).at[Sp:Sp + S, :n].set(al))
        b_k = (jnp.zeros((MpA, n_pad), kdt)
               .at[:M, :n].set(bh).at[Mp:Mp + M, :n].set(bl))
    else:
        a_k = jnp.zeros((SpA, n_pad), kdt).at[:S, :n].set(a.T.astype(kdt))
        b_k = jnp.zeros((MpA, n_pad), kdt).at[:M, :n].set(b.T.astype(kdt))
    ids_k = jnp.concatenate(
        [seg_ids.astype(jnp.int32),
         jnp.full((n_pad - n,), jnp.int32(2**30))]
    ).reshape(1, -1)
    # per-chunk cotangent block range [blo, bhi): first/last row's segment
    # block (sorted ids; the final chunk's guard rows clamp to the last real
    # row, and blo is clamped so guard-only chunks run zero iterations)
    first = ids_k[0, ::RB].astype(jnp.int32)
    last_idx = jnp.minimum(
        (jnp.arange(grid, dtype=jnp.int32) + 1) * RB, n) - 1
    last = seg_ids[last_idx].astype(jnp.int32)
    blo = jnp.minimum(first // W, n_segments // W)
    bhi = last // W + 1
    # sublane-pad the cotangent rows (DMA slices need tile-aligned heights)
    cot2d = cot.reshape(S, n_segments * M)
    if split3:
        ch, cl = _split_hi_lo(cot2d)
        cot_k = (jnp.zeros((SpA, n_segments * M), kdt)
                 .at[:S].set(ch).at[Sp:Sp + S].set(cl))
    else:
        cot_k = jnp.zeros((SpA, n_segments * M), cot.dtype
                          if kdt != jnp.bfloat16 else jnp.bfloat16)
        cot_k = cot_k.at[:S].set(
            cot2d.astype(kdt) if kdt == jnp.bfloat16 else cot2d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, RB), lambda j, *_: (0, j)),   # ids
            pl.BlockSpec((SpA, RB), lambda j, *_: (0, j)),  # a
            pl.BlockSpec((MpA, RB), lambda j, *_: (0, j)),  # b
            pl.BlockSpec(memory_space=pl.ANY),             # cot (inner DMA)
        ],
        out_specs=(
            pl.BlockSpec((Sp, RB), lambda j, *_: (0, j)),  # da
            pl.BlockSpec((Mp, RB), lambda j, *_: (0, j)),  # db
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SpA, W * M), cot_k.dtype),
            pltpu.VMEM((Sp, RB), jnp.float32),
            pltpu.VMEM((Mp, RB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, S=S, M=M, W=W, RB=RB,
        precision=(jax.lax.Precision.DEFAULT if split3
                   else _precision_for(sdt)),
        sdt=kdt, split3=split3, SpH=Sp, MpH=Mp,
    )
    da, db = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Sp, n_pad), a.dtype),
            jax.ShapeDtypeStruct((Mp, n_pad), b.dtype),
        ),
        interpret=interpret,
    )(blo, bhi, ids_k, a_k, b_k, cot_k)
    # grads must match the primal dtypes (custom-VJP contract)
    return da[:S, :n].T, db[:M, :n].T


# ======================================================================
# custom-VJP wiring (mutually recursive -> arbitrary-order differentiable)
# ======================================================================


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def segment_outer_sum(a, b, seg_ids, row_splits, n_segments,
                      implementation: Implementation = "auto",
                      seg_block: int | None = None):
    """out[s, e, m] = Σ_{t: seg_ids[t]==e} a[t,s]·b[t,m]; seg_ids sorted.

    `seg_block` (static) overrides the padded-density W heuristic with a
    host-chosen width (see _choose_blocks)."""
    if _use_pallas(implementation):
        return _outer_sum_pallas(a, b, seg_ids, row_splits, n_segments, seg_block)
    return _outer_sum_xla(a, b, seg_ids, n_segments)


def _sos_fwd(a, b, seg_ids, row_splits, n_segments, implementation, seg_block):
    out = segment_outer_sum(
        a, b, seg_ids, row_splits, n_segments, implementation, seg_block
    )
    return out, (a, b, seg_ids, row_splits)


def _sos_bwd(n_segments, implementation, seg_block, res, cot):
    a, b, seg_ids, row_splits = res
    da, db = segment_gather_contract(
        cot, a, b, seg_ids, row_splits, implementation, seg_block
    )
    return da, db, None, None


segment_outer_sum.defvjp(_sos_fwd, _sos_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def segment_gather_contract(cot, a, b, seg_ids, row_splits,
                            implementation: Implementation = "auto",
                            seg_block: int | None = None):
    """(da, db): da[t,s]=Σ_m cot[s,seg,m]·b[t,m]; db[t,m]=Σ_s cot[s,seg,m]·a[t,s]."""
    if _use_pallas(implementation):
        return _gather_contract_pallas(cot, a, b, seg_ids, row_splits, seg_block)
    return _gather_contract_xla(cot, a, b, seg_ids)


def _sgc_fwd(cot, a, b, seg_ids, row_splits, implementation, seg_block):
    out = segment_gather_contract(
        cot, a, b, seg_ids, row_splits, implementation, seg_block
    )
    return out, (cot, a, b, seg_ids, row_splits)


def _sgc_bwd(implementation, seg_block, res, cots):
    cot, a, b, seg_ids, row_splits = res
    ua, ub = cots
    n_segments = cot.shape[1]
    dcot = segment_outer_sum(
        ua, b, seg_ids, row_splits, n_segments, implementation, seg_block
    ) + segment_outer_sum(
        a, ub, seg_ids, row_splits, n_segments, implementation, seg_block
    )
    da, db = segment_gather_contract(
        cot, ua, ub, seg_ids, row_splits, implementation, seg_block
    )
    return dcot, da, db, None, None


segment_gather_contract.defvjp(_sgc_fwd, _sgc_bwd)
