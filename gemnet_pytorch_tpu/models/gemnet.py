"""GemNet: universal directional graph neural network (flax).

Top-level model covering all four reference variants (gemnet/model/gemnet.py:21-615):

| variant   | triplets_only | direct_forces |
|-----------|---------------|---------------|
| GemNet-Q  | False         | False         |
| GemNet-dQ | False         | True          |
| GemNet-T  | True          | False         |
| GemNet-dT | True          | True          |

The forward consumes one padded static-shape batch (data/padding.py) and
returns per-molecule energies and per-atom forces. Autograd forces
(-dE/dR, reference gemnet.py:598-613) are implemented with jax.grad in
`energy_and_forces`, keeping the whole computation jittable (double
backward during training is handled by JAX natively).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import geometry
from ..ops.segment import masked_segment_mean, masked_segment_sum
from .basis import CircularBasis, RadialBasis, SphericalBasis
from .interaction import InteractionBlock
from .layers import (
    AtomEmbedding,
    Dense,
    EdgeEmbedding,
    EfficientInteractionDownProjection,
    OutputBlock,
)
from .scaling import scale_names_in_creation_order  # noqa: F401  (re-export)


class GemNet(nn.Module):
    """GemNet-(d)T/(d)Q on padded batches. Construct via `GemNet(config=...)`."""

    config: ModelConfig

    def setup(self):
        cfg = self.config
        self.rbf_basis = RadialBasis(
            cfg.num_radial, cutoff=cfg.cutoff, envelope_exponent=cfg.envelope_exponent
        )
        self.cbf_basis3 = CircularBasis(
            cfg.num_spherical, cfg.num_radial, cutoff=cfg.cutoff,
            envelope_exponent=cfg.envelope_exponent,
        )
        if not cfg.triplets_only:
            # 2D basis over interaction edges (dense mode, int_cutoff!)
            self.cbf_basis = CircularBasis(
                cfg.num_spherical, cfg.num_radial, cutoff=cfg.int_cutoff,
                envelope_exponent=cfg.envelope_exponent,
            )
            self.sbf_basis = SphericalBasis(
                cfg.num_spherical, cfg.num_radial, cutoff=cfg.cutoff,
                envelope_exponent=cfg.envelope_exponent,
            )

    @nn.compact
    def __call__(
        self,
        batch: dict[str, jnp.ndarray],
        R: Optional[jnp.ndarray] = None,
        return_state: bool = False,
    ):
        """Returns (E, F_edge_or_atom):

        - E: (n_mol_pad, num_targets) per-molecule energies
        - direct_forces: F (n_atoms_pad, num_targets, 3) per-atom forces
        - else: F_ca (n_edges_pad, num_targets) per-edge scalar heads, plus
          the caller (energy_and_forces) derives -dE/dR.

        `R` overrides batch["R"] so jax.grad can differentiate w.r.t. it.

        `return_state=True` stops after the preamble (geometry, bases, shared
        down-projections, embeddings, OutBlock_0) and returns the pipeline
        state dict instead — the handoff point for pipeline-parallel
        execution (parallel/pp.py), whose stages run the interaction/output
        block pairs and whose tail is `finalize_outputs`.
        """
        cfg = self.config
        # bf16 mixed-precision mode: geometry + basis GENERATION stay fp32
        # (angle/envelope math is cancellation-sensitive and feeds the
        # double-backward force path); basis OUTPUTS and all layer compute are
        # cast to bf16; reductions accumulate fp32 (ops/segment.py); outputs
        # are returned fp32. Master params always stored fp32 (flax dtype=).
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        if R is None:
            R = batch["R"]
        with jax.default_matmul_precision(cfg.matmul_precision):
            return self._forward(batch, R, cdt, return_state=return_state)

    def _forward(self, batch, R, cdt, return_state=False):
        cfg = self.config
        Z = batch["Z"]
        id_c, id_a = batch["id_c"], batch["id_a"]
        edge_mask, atom_mask = batch["edge_mask"], batch["atom_mask"]
        masks = {
            "edge": edge_mask,
            "atom": atom_mask,
            "trip": batch["trip_mask"],
        }
        n_atoms = Z.shape[0]

        frequencies = self.param(
            "frequencies",
            lambda key: jnp.asarray(self.rbf_basis.init_frequencies()),
        )

        # ---- geometry ----
        D_ca, V_ca = geometry.interatomic_vectors(R, id_c, id_a, edge_mask)
        if cfg.ep_halo:
            # halo mode (parallel/halo.py): edge slots are shard-local and the
            # expand edge's source atom is precomputed per triplet row
            angles3 = geometry.triplet_angles_halo(
                R, id_c, id_a, batch["id3_reduce_ca"], batch["trip_b_atom"]
            )
        else:
            angles3 = geometry.triplet_angles(
                R, id_c, id_a, batch["id3_reduce_ca"], batch["id3_expand_ba"]
            )

        # ---- basis: triplets (efficient layout) ----
        rbf = self.rbf_basis(frequencies, D_ca) * edge_mask[:, None].astype(R.dtype)
        cbf3_env = self.cbf_basis3.rbf_env(D_ca, edge_mask)  # (E, S, R)
        sph3 = self.cbf_basis3.cbf(angles3)  # (T, S) — rows feed the fused
        # segment kernel directly; no padded dense is built

        basis: dict[str, Any] = {}
        if not cfg.triplets_only:
            masks.update(
                quad=batch["quad_mask"],
                intm_db=batch["intm_db_mask"],
                int_edge=batch["int_edge_mask"],
            )
            id4_int_a, id4_int_b = batch["id4_int_a"], batch["id4_int_b"]
            D_ab, _ = geometry.interatomic_vectors(
                R, id4_int_b, id4_int_a, masks["int_edge"]
            )
            if cfg.ep_halo:
                phi_cab, phi_abd, theta_cabd = geometry.quadruplet_angles_halo(
                    R, id_c, id_a, id4_int_b,
                    batch["id4_reduce_intm_ca"], batch["id4_reduce_intm_ab"],
                    batch["id4_reduce_cab"],
                    batch["intm_ext_a_atom"], batch["intm_ext_b_atom"],
                    batch["intm_ext_d_atom"],
                    batch["id4_expand_intm_db"].shape[0],
                    batch["id4_expand_abd"],
                )
            else:
                sort_ok = ("quad_abd_perm" in batch and
                           batch["quad_abd_perm"].shape
                           == batch["id4_expand_abd"].shape)
                phi_cab, phi_abd, theta_cabd = geometry.quadruplet_angles(
                    R, id_c, id_a, id4_int_b, id4_int_a,
                    batch["id4_expand_abd"], batch["id4_reduce_cab"],
                    batch["id4_expand_intm_db"], batch["id4_reduce_intm_ca"],
                    batch["id4_expand_intm_ab"], batch["id4_reduce_intm_ab"],
                    abd_sort=(batch["quad_abd_perm"], batch["quad_abd_sorted"])
                    if sort_ok else None,
                    cab_sort=(batch["quad_cab_perm"], batch["quad_cab_sorted"])
                    if sort_ok else None,
                )
            # dense circular basis on the intermediate d->b space
            # (reference gemnet.py:517, basis_layers.py:133-147).
            # The row gather runs on the FLAT (IE, S·R) view: gathering the
            # (·, S, R) 3-D layout makes the VJP a scatter in a hostile
            # tiling (~1.6 ms/step at bench shapes, round-4 trace) while the
            # 2-D form scatters lane-tiled rows; the reshape back for the
            # sph4 broadcast transposes to a reshape, not a scatter.
            cbf4_env = self.cbf_basis.rbf_env(D_ab, masks["int_edge"])  # (IE, S, R)
            cbf4_env_g = cbf4_env.reshape(cbf4_env.shape[0], -1)[
                batch["id4_expand_intm_ab"]
            ]  # (intm, S*R)
            sph4 = self.cbf_basis.cbf(phi_abd)  # (intm, S)
            n_intm_rows = cbf4_env_g.shape[0]
            cbf4_dense = (
                cbf4_env_g.reshape(n_intm_rows, sph4.shape[1], -1)
                * sph4[:, :, None]
            ).reshape(n_intm_rows, -1)  # (intm, S*R)
            # efficient spherical basis over quadruplets
            sbf_env = self.sbf_basis.rbf_env3(D_ca, edge_mask)  # (E, S^2, R)
            sph_sbf = self.sbf_basis.sbf(phi_cab, theta_cabd)  # (Q, S^2)
            if cdt is not None:
                cbf4_dense = cbf4_dense.astype(cdt)
                sbf_env = sbf_env.astype(cdt)
                sph_sbf = sph_sbf.astype(cdt)

        if cdt is not None:
            rbf = rbf.astype(cdt)
            cbf3_env = cbf3_env.astype(cdt)
            sph3 = sph3.astype(cdt)

        # ---- shared down-projections (reference gemnet.py:158-205,532-545) ----
        if not cfg.triplets_only:
            basis["rbf4"] = Dense(cfg.emb_size_rbf, dtype=cdt, name="mlp_rbf4")(rbf)
            basis["cbf4"] = Dense(cfg.emb_size_cbf, dtype=cdt, name="mlp_cbf4")(cbf4_dense)
            rbf_W1_sbf = EfficientInteractionDownProjection(
                cfg.num_spherical**2, cfg.num_radial, cfg.emb_size_sbf,
                dtype=cdt, name="mlp_sbf4"
            )(sbf_env)
            basis["sbf4"] = (rbf_W1_sbf, sph_sbf)
        basis["rbf3"] = Dense(cfg.emb_size_rbf, dtype=cdt, name="mlp_rbf3")(rbf)
        rbf_W1_cbf3 = EfficientInteractionDownProjection(
            cfg.num_spherical, cfg.num_radial, cfg.emb_size_cbf, dtype=cdt,
            name="mlp_cbf3"
        )(cbf3_env)
        basis["cbf3"] = (rbf_W1_cbf3, sph3)
        basis["rbf_h"] = Dense(cfg.emb_size_rbf, dtype=cdt, name="mlp_rbf_h")(rbf)
        rbf_out = Dense(cfg.emb_size_rbf, dtype=cdt, name="mlp_rbf_out")(rbf)

        # ---- embeddings ----
        h = AtomEmbedding(cfg.emb_size_atom, dtype=cdt, name="atom_emb")(Z)
        m = EdgeEmbedding(cfg.emb_size_edge, activation=cfg.activation,
                          dtype=cdt, name="edge_emb")(h, rbf, id_c, id_a)

        indices = {
            "id_c": id_c,
            "id_a": id_a,
            "id_swap": batch["id_swap"],
            "id3_expand_ba": batch["id3_expand_ba"],
            "id3_reduce_ca": batch["id3_reduce_ca"],
            "trip_row_splits": batch["trip_row_splits"],
        }
        if "trip_seg_block" in batch:
            # shape-carrier: host-chosen Pallas segment-block width from real
            # row density (data/padding.py); the LENGTH is the payload
            indices["trip_seg_block"] = batch["trip_seg_block"]
        # sort metadata for the sorted-VJP expand gather (padding.py);
        # absent/mismatched (halo/ep re-sliced rows) -> plain gather
        if ("trip_ba_perm" in batch and batch["trip_ba_perm"].shape
                == batch["id3_expand_ba"].shape):
            indices["trip_ba_sort"] = (
                batch["trip_ba_perm"], batch["trip_ba_sorted"])
        if not cfg.triplets_only:
            indices.update(
                id4_reduce_ca=batch["id4_reduce_ca"],
                id4_expand_intm_db=batch["id4_expand_intm_db"],
                id4_expand_abd=batch["id4_expand_abd"],
                quad_row_splits=batch["quad_row_splits"],
            )
            if "quad_seg_block" in batch:
                indices["quad_seg_block"] = batch["quad_seg_block"]
            # sort metadata for the sorted-VJP expand gather (padding.py);
            # absent/mismatched (halo/ep re-sliced rows) -> plain gather
            if ("quad_abd_perm" in batch and batch["quad_abd_perm"].shape
                    == batch["id4_expand_abd"].shape):
                indices["quad_abd_sort"] = (
                    batch["quad_abd_perm"], batch["quad_abd_sorted"])
                indices["quad_cab_sort"] = (
                    batch["quad_cab_perm"], batch["quad_cab_sorted"])
            if ("intm_db_perm" in batch and batch["intm_db_perm"].shape
                    == batch["id4_expand_intm_db"].shape):
                indices["intm_db_sort"] = (
                    batch["intm_db_perm"], batch["intm_db_sorted"])
        if cfg.ep_halo:
            indices.update(
                edge_halo_send_idx=batch["edge_halo_send_idx"],
                edge_halo_send_mask=batch["edge_halo_send_mask"],
            )
            if not cfg.triplets_only:
                indices.update(
                    intm_halo_send_idx=batch["intm_halo_send_idx"],
                    intm_halo_send_mask=batch["intm_halo_send_mask"],
                )

        # ---- block stack ----
        out_psum = cfg.ep_axis if cfg.ep_halo else None
        E_a, F_ca = OutputBlock(
            emb_size_atom=cfg.emb_size_atom,
            emb_size_edge=cfg.emb_size_edge,
            n_hidden=cfg.num_atom,
            num_targets=cfg.num_targets,
            activation=cfg.activation,
            direct_forces=cfg.direct_forces,
            output_init=cfg.output_init,
            scale_prefix="OutBlock_0",
            psum_axis=out_psum,
            dtype=cdt,
            name="out_blocks_0",
        )(h, m, rbf_out, id_a, edge_mask, atom_mask)

        if return_state:
            # pipeline handoff: carried state (h, m, E_a, F_ca) + the
            # per-microbatch constants every stage consumes (parallel/pp.py)
            return {
                "h": h, "m": m, "E_a": E_a, "F_ca": F_ca,
                "basis": basis, "rbf_out": rbf_out,
                "indices": indices, "masks": masks, "V_ca": V_ca,
            }

        # remat: recompute each block pair in the backward instead of holding
        # its intermediates (double-backward memory scales with num_blocks
        # otherwise); numerics are unchanged
        IBlock = nn.remat(InteractionBlock) if cfg.remat_blocks else InteractionBlock
        OBlock = nn.remat(OutputBlock) if cfg.remat_blocks else OutputBlock

        for i in range(cfg.num_blocks):
            h, m = IBlock(
                emb_size_atom=cfg.emb_size_atom,
                emb_size_edge=cfg.emb_size_edge,
                emb_size_trip=cfg.emb_size_trip,
                emb_size_quad=cfg.emb_size_quad,
                emb_size_bil_trip=cfg.emb_size_bil_trip,
                emb_size_bil_quad=cfg.emb_size_bil_quad,
                num_before_skip=cfg.num_before_skip,
                num_after_skip=cfg.num_after_skip,
                num_concat=cfg.num_concat,
                num_atom=cfg.num_atom,
                triplets_only=cfg.triplets_only,
                block_nr=i + 1,
                activation=cfg.activation,
                implementation=cfg.bilinear_implementation,
                ep_axis=cfg.ep_axis,
                ep_halo=cfg.ep_halo,
                dtype=cdt,
                name=f"int_blocks_{i}",
            )(h, m, basis, indices, masks)
            E, F = OBlock(
                emb_size_atom=cfg.emb_size_atom,
                emb_size_edge=cfg.emb_size_edge,
                n_hidden=cfg.num_atom,
                num_targets=cfg.num_targets,
                activation=cfg.activation,
                direct_forces=cfg.direct_forces,
                output_init=cfg.output_init,
                scale_prefix=f"OutBlock_{i + 1}",
                psum_axis=out_psum,
                dtype=cdt,
                name=f"out_blocks_{i + 1}",
            )(h, m, rbf_out, id_a, edge_mask, atom_mask)
            E_a = E_a + E
            F_ca = F_ca + F

        return finalize_outputs(cfg, batch, E_a, F_ca, V_ca)


def finalize_outputs(cfg: ModelConfig, batch, E_a, F_ca, V_ca):
    """Post-block tail: per-molecule energy aggregation + the direct-force
    edge->atom mapping (reference gemnet.py:578-592). Shared between the
    monolithic forward and the pipeline executor (parallel/pp.py)."""
    atom_mask, edge_mask = batch["atom_mask"], batch["edge_mask"]
    n_mol = batch["mol_mask"].shape[0]
    if cfg.extensive:
        E_mol = masked_segment_sum(E_a, batch["batch_seg"], n_mol, mask=atom_mask)
    else:
        E_mol = masked_segment_mean(E_a, batch["batch_seg"], n_mol, mask=atom_mask)

    E_mol = E_mol.astype(jnp.float32)
    if cfg.direct_forces:
        if cfg.forces_coupled:
            # |F_ca| = |F_ac| via undirected mean (reference gemnet.py:588-592)
            n_undir = batch["id_c"].shape[0] // 2
            F_und = masked_segment_mean(
                F_ca, batch["id_undir"], n_undir, mask=edge_mask
            )
            F_ca = F_und[batch["id_undir"]]
        # map scalar heads onto edge directions, aggregate per atom
        F_ji = F_ca[:, :, None] * V_ca[:, None, :]  # (E, T, 3)
        F_atom = masked_segment_sum(
            F_ji, batch["id_a"], batch["Z"].shape[0], mask=edge_mask
        )
        if cfg.ep_halo:
            F_atom = jax.lax.psum(F_atom, cfg.ep_axis)
        return E_mol, F_atom.astype(jnp.float32)
    return E_mol, F_ca.astype(jnp.float32)


def make_model(cfg: ModelConfig) -> GemNet:
    if cfg.matmul_precision == "high":
        # fp32 bilinear kernels run the manual 3-pass bf16-split mode (~2x
        # MXU rate, ~1e-6 rel err; Mosaic has no Precision.HIGH). Process-
        # wide flag: custom-VJP backward rules trace outside the forward's
        # precision context (ops/pallas/segment_outer.FP32_SPLIT3).
        from ..ops.pallas.segment_outer import set_fp32_split3

        set_fp32_split3(True)
    return GemNet(config=cfg)


def energy_and_forces(
    model: GemNet,
    variables,
    batch,
    mutable=(),
):
    """Energy + forces with the variant-appropriate force path.

    direct_forces: model returns them directly.
    otherwise: F = -dE_sum/dR via jax.grad (reference gemnet.py:598-613);
    per-target loop for num_targets > 1.
    """
    cfg = model.config

    def apply(R):
        out, aux = model.apply(variables, batch, R, mutable=list(mutable))
        return out, aux

    if cfg.direct_forces:
        (E, F), aux = apply(batch["R"])
        return E, F, aux

    def energy_sum(R, target):
        (E, _), aux = apply(R)
        return jnp.sum(E[:, target]), (E, aux)

    if cfg.num_targets == 1:
        grad_fn = jax.grad(lambda R: energy_sum(R, 0), has_aux=True)
        dE_dR, (E, aux) = grad_fn(batch["R"])
        F = -dE_dR[:, None, :]  # (nAtoms, 1, 3)
    else:
        # ONE forward + a vmapped VJP over the target axis (jacrev structure)
        # instead of re-running the full forward per target — halves the MVE
        # non-direct variants' cost at T=2
        def energy_sums(R):
            (E, _), aux = apply(R)
            return jnp.sum(E, axis=0), (E, aux)  # (T,)

        (_, vjp, (E, aux)) = jax.vjp(energy_sums, batch["R"], has_aux=True)
        basis = jnp.eye(cfg.num_targets, dtype=E.dtype)
        dE_dR = jax.vmap(lambda v: vjp(v)[0])(basis)  # (T, nAtoms, 3)
        F = -jnp.transpose(dE_dR, (1, 0, 2))  # (nAtoms, T, 3)
    return E, F, aux
