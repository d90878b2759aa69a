"""Interaction blocks: one message-passing round over the index hierarchy.

Counterparts of gemnet/model/layers/interaction_block.py: quadruplet and
triplet message passing with the efficient bilinear contraction, residual
stacks around the skip connection, atom update, and the atom->edge concat
update. Merge scalings (1/sqrt(3) with quadruplets, 1/sqrt(2) without;
reference interaction_block.py:202-203,390-391) and every skip's 1/sqrt(2)
match the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .layers import (
    AtomUpdateBlock,
    Dense,
    EdgeEmbedding,
    EfficientInteractionBilinear,
    ResidualLayer,
    ScalingFactor,
)

_INV_SQRT2 = 2.0**-0.5
_INV_SQRT3 = 3.0**-0.5


class QuadrupletInteraction(nn.Module):
    """Quadruplet-based message passing (reference interaction_block.py:425-566)."""

    emb_size_edge: int
    emb_size_quad: int
    emb_size_bilinear: int
    activation: Optional[str] = None
    scale_prefix: str = "QuadInteraction_1"
    implementation: str = "auto"
    ep_axis: Optional[str] = None
    dtype: Optional[Any] = None
    seg_block: Optional[int] = None

    @nn.compact
    def __call__(self, m, rbf, cbf, sbf, quad_row_splits, id_swap, id4_reduce_ca,
                 id4_expand_intm_db, id4_expand_abd, masks, halo=None,
                 stage="all", x_pre=None, abd_sort=None, intm_sort=None):
        # Two-stage calling convention (halo comm/compute overlap): the
        # prelude ends exactly where the intm-row activations become the
        # payload of the halo all_to_all; InteractionBlock issues both
        # spaces' exchanges between the prelude and finish calls so each
        # collective overlaps the other path's dense work. stage="all"
        # (single-device / rung-2a path) is the fused original behavior.
        if stage != "finish":
            x_db = Dense(self.emb_size_edge, activation=self.activation,
                         dtype=self.dtype, name="dense_db")(m)

            # radial basis hadamard
            x_db2 = x_db * Dense(self.emb_size_edge, dtype=self.dtype, name="mlp_rbf")(rbf)
            x_db = ScalingFactor(self.scale_prefix + "_had_rbf", name="scale_rbf")(
                x_db, x_db2, mask_ref=masks["edge"], mask_y=masks["edge"]
            )
            x_db = Dense(self.emb_size_quad, activation=self.activation,
                         dtype=self.dtype, name="down_projection")(x_db)

            # circular basis hadamard on the intermediate d->b space (halo
            # mode: intm_db rows live with their d->b edge, so this gather is
            # LOCAL). Defensive guard, mirroring TripletInteraction: the
            # sorted-VJP path is valid only for the single-device stage="all"
            # call — halo/ep partitioners re-slice the row spaces, so a
            # matching-shape sort carried into a prelude/finish/halo call
            # would sum cotangents under stale global perms.
            if (intm_sort is not None and stage == "all" and halo is None
                    and x_pre is None):
                from ..ops.pallas.expand_gather import expand_gather

                x_db = expand_gather(
                    x_db, id4_expand_intm_db, intm_sort[0], intm_sort[1],
                    x_db.shape[0], self.implementation,
                )
            else:
                x_db = x_db[id4_expand_intm_db]
            x_db2 = x_db * Dense(self.emb_size_quad, dtype=self.dtype, name="mlp_cbf")(cbf)
            x_db = ScalingFactor(self.scale_prefix + "_had_cbf", name="scale_cbf")(
                x_db, x_db2, mask_ref=masks["intm_db"], mask_y=masks["intm_db"]
            )
            if stage == "prelude":
                return x_db

            # spherical basis bilinear over quadruplets -> edges (halo mode: one
            # all_to_all fetches the remote intm rows local quads reference)
            if halo is not None:
                from ..parallel.halo import halo_extend

                x_db = halo_extend(x_db, *halo["intm_send"], halo["axis"])
        else:
            x_db = x_pre  # prelude output, halo-extended by the caller
        if abd_sort is not None and halo is None and x_pre is None:
            # sorted-VJP gather: the backward runs as a Pallas sorted
            # segment sum instead of a serial scatter-add
            # (ops/pallas/expand_gather.py; metadata is invalid for
            # halo/ep re-sliced batches -> plain gather)
            from ..ops.pallas.expand_gather import expand_gather

            x_db = expand_gather(
                x_db, id4_expand_abd, abd_sort[0], abd_sort[1],
                x_db.shape[0], self.implementation,
            )
        else:
            x_db = x_db[id4_expand_abd]
        rbf_W1, sph_rows = sbf
        x = EfficientInteractionBilinear(
            self.emb_size_quad, rbf_W1.shape[1], self.emb_size_bilinear,
            implementation=self.implementation, dtype=self.dtype,
            seg_block=self.seg_block, name="mlp_sbf",
        )(rbf_W1, sph_rows, x_db, id4_reduce_ca, quad_row_splits,
          mask=masks["quad"])
        if self.ep_axis:
            from ..parallel.ep import psum_replicated_grad

            x = psum_replicated_grad(x, self.ep_axis)
        x = ScalingFactor(self.scale_prefix + "_sum_sbf", name="scale_sbf_sum")(
            x_db, x, mask_ref=masks["quad"], mask_y=masks["edge"]
        )

        x_ca = Dense(self.emb_size_edge, activation=self.activation,
                     dtype=self.dtype, name="up_projection_ca")(x)
        x_ac = Dense(self.emb_size_edge, activation=self.activation,
                     dtype=self.dtype, name="up_projection_ac")(x)
        x_ac = x_ac[id_swap]
        return (x_ca + x_ac) * _INV_SQRT2


class TripletInteraction(nn.Module):
    """Triplet-based message passing (reference interaction_block.py:569-696)."""

    emb_size_edge: int
    emb_size_trip: int
    emb_size_bilinear: int
    activation: Optional[str] = None
    scale_prefix: str = "TripInteraction_1"
    implementation: str = "auto"
    ep_axis: Optional[str] = None
    dtype: Optional[Any] = None
    seg_block: Optional[int] = None

    @nn.compact
    def __call__(self, m, rbf3, cbf3, trip_row_splits, id_swap, id3_expand_ba,
                 id3_reduce_ca, masks, halo=None, stage="all", x_pre=None,
                 ba_sort=None):
        # Same two-stage convention as QuadrupletInteraction: the prelude
        # ends at the down-projected edge activations (the halo payload).
        if stage != "finish":
            x_ba = Dense(self.emb_size_edge, activation=self.activation,
                         dtype=self.dtype, name="dense_ba")(m)

            x_ba2 = x_ba * Dense(self.emb_size_edge, dtype=self.dtype, name="mlp_rbf")(rbf3)
            x_ba = ScalingFactor(self.scale_prefix + "_had_rbf", name="scale_rbf")(
                x_ba, x_ba2, mask_ref=masks["edge"], mask_y=masks["edge"]
            )
            x_ba = Dense(self.emb_size_trip, activation=self.activation,
                         dtype=self.dtype, name="down_projection")(x_ba)
            if stage == "prelude":
                return x_ba

            # halo mode: one all_to_all fetches the remote edge rows local
            # triplets reference, then the (remapped) expand gather is local
            if halo is not None:
                from ..parallel.halo import halo_extend

                x_ba = halo_extend(x_ba, *halo["edge_send"], halo["axis"])
        else:
            x_ba = x_pre  # prelude output, halo-extended by the caller
        if ba_sort is not None and halo is None and x_pre is None:
            # sorted-VJP gather: the backward runs as a Pallas sorted
            # segment sum instead of a serial scatter-add (metadata is
            # absent for halo/ep re-sliced batches -> plain gather)
            from ..ops.pallas.expand_gather import expand_gather

            x_ba = expand_gather(
                x_ba, id3_expand_ba, ba_sort[0], ba_sort[1],
                x_ba.shape[0], self.implementation,
            )
        else:
            x_ba = x_ba[id3_expand_ba]
        rbf_W1, sph_rows = cbf3
        x = EfficientInteractionBilinear(
            self.emb_size_trip, rbf_W1.shape[1], self.emb_size_bilinear,
            implementation=self.implementation, dtype=self.dtype,
            seg_block=self.seg_block, name="mlp_cbf",
        )(rbf_W1, sph_rows, x_ba, id3_reduce_ca, trip_row_splits,
          mask=masks["trip"])
        if self.ep_axis:
            from ..parallel.ep import psum_replicated_grad

            x = psum_replicated_grad(x, self.ep_axis)
        x = ScalingFactor(self.scale_prefix + "_sum_cbf", name="scale_cbf_sum")(
            x_ba, x, mask_ref=masks["trip"], mask_y=masks["edge"]
        )

        x_ca = Dense(self.emb_size_edge, activation=self.activation,
                     dtype=self.dtype, name="up_projection_ca")(x)
        x_ac = Dense(self.emb_size_edge, activation=self.activation,
                     dtype=self.dtype, name="up_projection_ac")(x)
        x_ac = x_ac[id_swap]
        return (x_ca + x_ac) * _INV_SQRT2


class InteractionBlock(nn.Module):
    """Full interaction block; quadruplet path optional (covers both
    InteractionBlock and InteractionBlockTripletsOnly of the reference,
    interaction_block.py:11-234,237-422)."""

    emb_size_atom: int
    emb_size_edge: int
    emb_size_trip: int
    emb_size_quad: int
    emb_size_bil_trip: int
    emb_size_bil_quad: int
    num_before_skip: int
    num_after_skip: int
    num_concat: int
    num_atom: int
    triplets_only: bool
    block_nr: int = 1
    activation: Optional[str] = None
    implementation: str = "auto"
    ep_axis: Optional[str] = None
    ep_halo: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, m, basis, indices, masks):
        x_ca_skip = Dense(self.emb_size_edge, activation=self.activation,
                          dtype=self.dtype, name="dense_ca")(m)

        # halo (rung 2b) mode: rows reduce onto LOCAL edges (no rung-2a psum
        # of bilinear outputs); expand gathers go through halo all_to_alls
        halo = None
        sub_ep_axis = self.ep_axis
        if self.ep_halo:
            sub_ep_axis = None
            halo = {
                "axis": self.ep_axis,
                "edge_send": (indices["edge_halo_send_idx"],
                              indices["edge_halo_send_mask"]),
            }
            if not self.triplets_only:
                halo["intm_send"] = (indices["intm_halo_send_idx"],
                                     indices["intm_halo_send_mask"])

        # seg_block carriers: host-chosen Pallas W from REAL row density
        # (shape is the payload; shape[-1] survives vmap'd leading axes)
        def _sb(key):
            arr = indices.get(key)
            return int(arr.shape[-1]) if arr is not None else None

        trip = TripletInteraction(
            emb_size_edge=self.emb_size_edge,
            emb_size_trip=self.emb_size_trip,
            emb_size_bilinear=self.emb_size_bil_trip,
            activation=self.activation,
            scale_prefix=f"TripInteraction_{self.block_nr}",
            implementation=self.implementation,
            ep_axis=sub_ep_axis,
            dtype=self.dtype,
            seg_block=_sb("trip_seg_block"),
            name="trip_interaction",
        )
        t_args = (
            m, basis["rbf3"], basis["cbf3"], indices["trip_row_splits"],
            indices["id_swap"], indices["id3_expand_ba"],
            indices["id3_reduce_ca"], masks,
        )
        t_kwargs = {"ba_sort": indices.get("trip_ba_sort")}
        quad = None
        if not self.triplets_only:
            quad = QuadrupletInteraction(
                emb_size_edge=self.emb_size_edge,
                emb_size_quad=self.emb_size_quad,
                emb_size_bilinear=self.emb_size_bil_quad,
                activation=self.activation,
                scale_prefix=f"QuadInteraction_{self.block_nr}",
                implementation=self.implementation,
                ep_axis=sub_ep_axis,
                dtype=self.dtype,
                seg_block=_sb("quad_seg_block"),
                name="quad_interaction",
            )
            q_args = (
                m, basis["rbf4"], basis["cbf4"], basis["sbf4"],
                indices["quad_row_splits"], indices["id_swap"],
                indices["id4_reduce_ca"], indices["id4_expand_intm_db"],
                indices["id4_expand_abd"], masks,
            )
            q_kwargs = {"abd_sort": indices.get("quad_abd_sort"),
                        "intm_sort": indices.get("intm_db_sort")}

        if halo is not None:
            # Comm/compute overlap: issue each space's halo all_to_all as
            # soon as its payload exists and consume it as late as possible —
            # the edge exchange flies during the quad prelude (4 dense layers
            # over the intm space) and the intm exchange flies during the
            # triplet bilinear. XLA's TPU latency-hiding scheduler turns the
            # program-order gap between -start/-done into real ICI overlap;
            # exactness is unchanged (tests/test_halo.py).
            from ..parallel.halo import halo_extend

            x_ba = trip(*t_args, stage="prelude", **t_kwargs)
            x_ba = halo_extend(x_ba, *halo["edge_send"], halo["axis"])
            if quad is not None:
                x_db = quad(*q_args, stage="prelude", **q_kwargs)
                x_db = halo_extend(x_db, *halo["intm_send"], halo["axis"])
            x3 = trip(*t_args, stage="finish", x_pre=x_ba, **t_kwargs)
            if quad is not None:
                x4 = quad(*q_args, stage="finish", x_pre=x_db, **q_kwargs)
        else:
            x3 = trip(*t_args, **t_kwargs)
            if quad is not None:
                x4 = quad(*q_args, **q_kwargs)

        if not self.triplets_only:
            x = (x_ca_skip + x3 + x4) * _INV_SQRT3
        else:
            x = (x_ca_skip + x3) * _INV_SQRT2

        for i in range(self.num_before_skip):
            x = ResidualLayer(self.emb_size_edge, activation=self.activation,
                              dtype=self.dtype, name=f"res_bef_skip_{i}")(x)
        m = (m + x) * _INV_SQRT2
        for i in range(self.num_after_skip):
            m = ResidualLayer(self.emb_size_edge, activation=self.activation,
                              dtype=self.dtype, name=f"res_aft_skip_{i}")(m)

        h2 = AtomUpdateBlock(
            emb_size_atom=self.emb_size_atom,
            emb_size_edge=self.emb_size_edge,
            n_hidden=self.num_atom,
            activation=self.activation,
            scale_name=f"AtomUpdate_{self.block_nr}_sum",
            psum_axis=self.ep_axis if self.ep_halo else None,
            dtype=self.dtype,
            name="atom_update",
        )(h, m, basis["rbf_h"], indices["id_a"], masks["edge"], masks["atom"])
        h = (h + h2) * _INV_SQRT2

        m2 = EdgeEmbedding(self.emb_size_edge, activation=self.activation,
                           dtype=self.dtype, name="concat_layer")(h, m, indices["id_c"], indices["id_a"])
        for i in range(self.num_concat):
            m2 = ResidualLayer(self.emb_size_edge, activation=self.activation,
                               dtype=self.dtype, name=f"res_m_{i}")(m2)
        m = (m + m2) * _INV_SQRT2
        return h, m
