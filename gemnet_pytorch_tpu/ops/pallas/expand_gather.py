"""Expand gather with a sorted-reduction VJP — kills the quad-space
scatter-adds.

The quad pipeline gathers intm-space rows to quadruplet rows
(`x[id4_expand_abd]`, `packed[id4_reduce_cab]`, models/interaction.py +
ops/geometry.py). XLA's gather forward is fine (~0.3 ms at bench shapes),
but its VJP is a scatter-add whose cost on TPU is per-ROW and serial
(~1.3-1.7 ms per instance; 8-12 instances per train step after the double
backward — scripts/scatter_probe.py, artifacts_r04_perf.md).

`expand_gather(table, idx, perm, sorted_ids)` computes the same `table[idx]`
but carries HOST-precomputed sort metadata (data/padding.py):

    perm       : int32[n_rows], stable argsort of idx
    sorted_ids : int32[n_rows], idx[perm] (ascending)

so the VJP becomes  permute-the-cotangent + SORTED segment sum, and the
sorted segment sum runs as a Pallas kernel: grid over wide blocks of W
segment ids, rows streamed once, a (W, RB) one-hot MXU contraction per
chunk — embarrassingly parallel where the scatter was serial. The segsum's
own VJP is `expand_gather` again (dx[j] = g[idx[j]]), closing the recursion
for the force path's double backward.

Numerics: products are 0/1-weighted (exact); accumulation fp32 on the MXU
at HIGHEST precision. Results equal the scatter-add path up to fp32
summation order (different reassociation of the same terms).

Callers fall back to a plain `table[idx]` when the sort metadata is absent
or shape-mismatched (halo/ep partitioned batches re-slice the row spaces,
invalidating global perms — parallel/ep.py replicates unknown keys).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .segment_outer import ROW_BLOCK, _out_dtype, _round_up, _use_pallas


def _log(kind: str, **kw):
    from . import segment_outer as so

    if so.TRACE_LOG is not None:
        so.TRACE_LOG.append(dict(kind=kind, **kw))


def _pick_w(n_segments: int) -> int | None:
    # narrowest admissible block first: the per-chunk one-hot build is
    # (W, RB) VPU work, and W=512 made it the kernel's dominant cost
    # (~0.3 of 0.49 ms/call at bench shapes, round-5 trace); W=128 is one
    # lane tile — minimal one-hot work at a slightly longer grid
    for w in (128, 256, 512):
        if n_segments % w == 0 and n_segments >= w:
            return w
    return None


def _segsum_xla(xp, sorted_ids, n_segments):
    out = jax.ops.segment_sum(
        xp.astype(jnp.float32), sorted_ids, num_segments=n_segments,
        indices_are_sorted=True,
    )
    # same output-dtype contract as the Pallas kernel: bf16 rows round the
    # fp32 sums at the store (the consumer casts to the row dtype anyway)
    return out.astype(_out_dtype(jnp.dtype(xp.dtype)))


def _segsum_pallas(xp, sorted_ids, n_segments, interpret=False):
    """Sorted segment sum: xp (n, M) rows ordered by sorted_ids -> (nseg, M)
    fp32. Grid over blocks of W segment ids; each step streams its row range
    in double-buffered ROW_BLOCK chunks and reduces with one (W, RB) one-hot
    MXU contraction per chunk (lanes = W, fully tiled)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, M = xp.shape
    W = _pick_w(n_segments)
    assert W is not None
    RB = ROW_BLOCK
    sdt = jnp.dtype(xp.dtype)
    if sdt != jnp.bfloat16:
        sdt = jnp.dtype(jnp.float32)
    sub = 16 if sdt == jnp.bfloat16 else 8
    Mp = _round_up(M, sub)
    _log("segsum", n=n, S=1, M=M, n_segments=n_segments, W=W, RB=RB,
         dtype=str(sdt))
    pad = RB
    x_k = jnp.zeros((Mp, n + pad), sdt).at[:M, :n].set(xp.T.astype(sdt))
    ids_k = jnp.concatenate(
        [sorted_ids.astype(jnp.int32), jnp.full((pad,), jnp.int32(2**30))]
    ).reshape(1, -1)
    bounds = jnp.arange(0, n_segments + W, W, dtype=jnp.int32)
    # scan_unrolled: the default 'scan' method is a serial while-loop
    # (~1.9 ms/step at bench shapes — see segment_outer._fine_splits)
    splits = jnp.searchsorted(
        sorted_ids.astype(jnp.int32), bounds, side="left",
        method="scan_unrolled",
    ).astype(jnp.int32)

    from .segment_outer import _precision_for

    precision = _precision_for(sdt)

    def kernel(splits_ref, ids_ref, x_ref, out_ref, x_s, ids_s, acc, sems):
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
                    x_ref.at[:, pl.ds(row0, RB)], x_s.at[slot], sems.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    ids_ref.at[:, pl.ds(row0, RB)], ids_s.at[slot],
                    sems.at[slot, 1]
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
            sel = (ids[None, :] == e0 + jax.lax.broadcasted_iota(
                jnp.int32, (W, RB), 0)).astype(sdt)
            # (Mp, RB) @ (W, RB)^T -> (Mp, W): W on the lane dim, full tiles
            acc[...] += jax.lax.dot_general(
                x_s[cur], sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[...] = acc[...].astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_segments // W,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ids
            pl.BlockSpec(memory_space=pl.ANY),  # x
        ],
        out_specs=pl.BlockSpec(
            (Mp, W), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, Mp, RB), sdt),
            pltpu.VMEM((2, 1, RB), jnp.int32),
            pltpu.VMEM((Mp, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, n_segments), _out_dtype(sdt)),
        interpret=interpret,
    )(splits, ids_k, x_k)
    return out[:M].T


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def expand_gather(table, idx, perm, sorted_ids, n_src: int,
                  implementation: str = "auto"):
    """table[idx] with a sorted-reduction VJP (see module docstring).

    table: (n_src, M); idx/perm/sorted_ids: (n_rows,) int32 with
    sorted_ids == idx[perm] ascending. n_src static.
    """
    # census hook: XLA row gathers are ROW-RATE-bound on TPU (~0.33 ms for
    # 192512 rows in-step — round-5 trace/probe) and set a real floor term
    # in the roofline (perf/roofline.py 'gather' kind)
    _log("gather", n=idx.shape[0], S=1, M=table.shape[1], n_segments=n_src,
         W=0, RB=0, dtype=str(jnp.dtype(table.dtype)))
    return table[idx]


def _eg_fwd(table, idx, perm, sorted_ids, n_src, implementation):
    # call the custom op (NOT a raw table[idx]): under grad-of-grad the fwd
    # body is differentiated as plain ops, and an inlined gather would hand
    # the double backward a raw scatter-add again — the exact op this
    # module exists to remove (same recursion pattern as segment_outer's
    # _sos_fwd/_sgc_fwd; caught by the round-4 trace showing 4 surviving
    # scatters at the expand_gather call sites)
    out = expand_gather(table, idx, perm, sorted_ids, n_src, implementation)
    return out, (idx, perm, sorted_ids)


def _eg_bwd(n_src, implementation, res, cot):
    idx, perm, sorted_ids = res
    d_table = _sorted_segsum(
        cot, perm, sorted_ids, idx, n_src, implementation
    ).astype(cot.dtype)
    return d_table, None, None, None


expand_gather.defvjp(_eg_fwd, _eg_bwd)


# Above this many source bytes, skip the permute and scatter-add directly:
# the permute's random row reads stop being served from XLA's VMEM staging
# once the source outgrows it, and the gather rate collapses ~16x (large
# bench quad space, 2.45M x 32 bf16 = 157 MB: permute 67.7 ms standalone at
# ~36 M rows/s vs an unsorted scatter-add at 42.8 ms; in-step the scatter
# runs 33.6 ms — large step 842 -> 616 ms. At the small shape, 12.3 MB,
# the permute runs 0.33 ms and the sorted path wins 3x. Wide rows only
# (M >= 8): the fp32 geometry streams are narrow (M=3/4), their
# column-major permutes are only ~2x off row rate and beat the scatter at
# every measured size.)
_PERMUTE_MAX_BYTES = 32 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sorted_segsum(x, perm, sorted_ids, idx, n_src: int,
                   implementation: str = "auto"):
    """sum of x rows grouped by idx (via the sorted order): the VJP of
    expand_gather. Its own VJP is expand_gather again (dx[j] = g[idx[j]]),
    closing the double-backward recursion."""
    n, M = x.shape
    if M >= 8 and n * M * jnp.dtype(x.dtype).itemsize > _PERMUTE_MAX_BYTES:
        # huge row space: unsorted scatter-add beats permute+sorted-sum
        out = jax.ops.segment_sum(
            x.astype(jnp.float32), idx, num_segments=n_src)
        return out.astype(_out_dtype(jnp.dtype(x.dtype)))
    # the permute is itself a row-rate-bound XLA gather (roofline floor term)
    _log("gather", n=n, S=1, M=M, n_segments=n, W=0, RB=0,
         dtype=str(jnp.dtype(x.dtype)))
    xp = x[perm]
    if _use_pallas(implementation) and _pick_w(n_src) is not None:
        return _segsum_pallas(xp, sorted_ids, n_src)
    return _segsum_xla(xp, sorted_ids, n_src)


def _ss_fwd(x, perm, sorted_ids, idx, n_src, implementation):
    out = _sorted_segsum(x, perm, sorted_ids, idx, n_src, implementation)
    # zero-size dtype sentinel: the cotangent for x must carry x's dtype
    # (bf16 mode: g is the f32 segsum output's cotangent, x is bf16 — an
    # uncast dx leaks an f32 cotangent into the bf16 graph and the double
    # backward dies on a mixed-dtype mul)
    return out, (idx, perm, sorted_ids, jnp.zeros((0,), x.dtype))


def _ss_bwd(n_src, implementation, res, g):
    idx, perm, sorted_ids, x_dt = res
    # cast BEFORE the gather: same values (gather commutes with the cast),
    # half the row traffic in bf16 mode
    dx = expand_gather(
        g.astype(x_dt.dtype), idx, perm, sorted_ids, n_src, implementation
    )
    return dx, None, None, None


_sorted_segsum.defvjp(_ss_fwd, _ss_bwd)
