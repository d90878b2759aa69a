"""Core network layers (flax.linen modules).

Functional JAX counterparts of gemnet/model/layers/base_layers.py,
embedding_block.py, atom_update_block.py, efficient.py, scaling.py. Numerics
(ScaledSiLU 1/0.6, 1/sqrt(2) residual scaling, bias-free Dense defaults,
he_orthogonal init) match the reference exactly; structure is idiomatic
linen so parameter paths support the name-based optimizer masks the trainer
uses ('bias', 'atom_emb', 'frequencies', 'out_energy', 'out_forces').
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import bilinear as bil_ops
from ..ops.segment import masked_segment_sum
from .initializers import atom_embedding_init, he_orthogonal

SCALE_COLLECTION = "scale_factors"
STATS_COLLECTION = "scale_stats"


def scaled_silu(x: jnp.ndarray) -> jnp.ndarray:
    """SiLU scaled by 1/0.6 (reference base_layers.py:51-58)."""
    return nn.silu(x) * (1.0 / 0.6)


def _resolve_activation(activation: Optional[str]) -> Optional[Callable]:
    if activation is None:
        return None
    if activation.lower() in ("swish", "silu"):
        return scaled_silu
    raise NotImplementedError(f"activation {activation}")


class Dense(nn.Module):
    """Dense layer, bias-free by default, he_orthogonal init, optional
    ScaledSiLU (reference base_layers.py:5-48).

    `dtype` is the flax compute dtype: params are stored fp32 and cast to
    it per-call (bf16 mixed-precision mode, ModelConfig.compute_dtype)."""

    features: int
    activation: Optional[str] = None
    use_bias: bool = False
    kernel_init: Callable = he_orthogonal
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        act = _resolve_activation(self.activation)
        return act(x) if act else x


class ResidualLayer(nn.Module):
    """Two bias-free Dense layers + skip, scaled 1/sqrt(2)
    (reference base_layers.py:61-89)."""

    units: int
    activation: Optional[str] = None
    n_layers: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.n_layers):
            h = Dense(self.units, activation=self.activation, dtype=self.dtype,
                      name=f"dense_{i}")(h)
        return (x + h) * (2.0**-0.5)


class AtomEmbedding(nn.Module):
    """93-element embedding table, uniform(-sqrt3, sqrt3) init; input Z-1
    (reference embedding_block.py:7-34)."""

    emb_size: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, Z):
        table = self.param("embeddings", atom_embedding_init, (93, self.emb_size))
        out = table[Z - 1]
        return out.astype(self.dtype) if self.dtype is not None else out


class EdgeEmbedding(nn.Module):
    """Dense over [h_target ‖ h_source ‖ m] (reference embedding_block.py:37-75).
    Also reused as the interaction block's concat layer with m in place of rbf."""

    features: int
    activation: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, m_rbf, id_first, id_second):
        # concatenation order matches the reference call sites
        # (edge_emb(h, rbf, id_c, id_a) -> [h[id_c], h[id_a], rbf];
        # embedding_block.py:63-75, gemnet.py:529, interaction_block.py:226)
        cat = jnp.concatenate([h[id_first], h[id_second], m_rbf], axis=-1)
        return Dense(self.features, activation=self.activation, dtype=self.dtype,
                     name="dense")(cat)


class ScalingFactor(nn.Module):
    """Non-trainable activation-variance scale (reference scaling.py:150-174).

    y is multiplied by a stored scale factor. For the fitting pipeline
    (fit_scaling), masked per-feature variance statistics of (x_ref, y) are
    sown into the `scale_stats` collection; the host-side fitter consumes
    them one factor at a time (see gemnet_pytorch_tpu/fit_scaling.py).
    The factor is keyed by its global reference name (e.g.
    'TripInteraction_1_had_rbf') so pretrained/scaling_factors.json loads
    directly.
    """

    scale_name: str

    @nn.compact
    def __call__(self, x_ref, y, mask_ref=None, mask_y=None):
        scale = self.variable(
            SCALE_COLLECTION, self.scale_name, lambda: jnp.asarray(1.0, jnp.float32)
        )
        # cast the fp32 scale down rather than letting promotion upcast y
        # (bf16 compute mode must stay bf16 through the multiply)
        y = y * scale.value.astype(y.dtype)

        def masked_feature_var(t, mask):
            t2 = t.reshape(t.shape[0], -1).astype(jnp.float32)
            if mask is None:
                n = jnp.asarray(t2.shape[0], t2.dtype)
                mean = jnp.mean(t2, axis=0)
                var = jnp.sum((t2 - mean) ** 2, axis=0) / jnp.maximum(n - 1, 1)
            else:
                m = mask.astype(t2.dtype)[:, None]
                n = jnp.sum(m)
                mean = jnp.sum(t2 * m, axis=0) / jnp.maximum(n, 1)
                var = jnp.sum(((t2 - mean) ** 2) * m, axis=0) / jnp.maximum(n - 1, 1)
            return jnp.mean(var), n

        var_in, _ = masked_feature_var(x_ref, mask_ref)
        var_out, n_out = masked_feature_var(y, mask_y)
        # reference weighs both variances by nSamples = y.shape[0]
        # (scaling.py:107-120)
        self.sow(
            STATS_COLLECTION,
            self.scale_name,
            jnp.stack([var_in * n_out, var_out * n_out, n_out]),
            reduce_fn=lambda prev, cur: cur + (prev if prev is not None else 0.0),
            init_fn=lambda: jnp.zeros(3),
        )
        return y


class EfficientInteractionDownProjection(nn.Module):
    """Per-order radial down-projection weight (reference efficient.py:5-57)."""

    num_spherical: int
    num_radial: int
    emb_size_interm: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, rbf_env):
        """rbf_env: (nEdges, S, R) -> (nEdges, I, S)."""
        w = self.param(
            "weight",
            he_orthogonal,
            (self.num_spherical, self.num_radial, self.emb_size_interm),
        )
        if self.dtype is not None:
            rbf_env = rbf_env.astype(self.dtype)
            w = w.astype(self.dtype)
        return bil_ops.down_projection(rbf_env, w)


class EfficientInteractionBilinear(nn.Module):
    """Bilinear contraction + neighbor sum (reference efficient.py:120-189),
    running on the fused segment-outer-sum kernel (ops/bilinear.py)."""

    emb_size: int
    emb_size_interm: int
    units_out: int
    implementation: str = "auto"
    dtype: Optional[Any] = None
    # host-chosen Pallas segment-block width from REAL row density
    # (data/padding.py shape carrier); None -> padded-dims heuristic
    seg_block: Optional[int] = None

    @nn.compact
    def __call__(self, rbf_W1, sph_rows, m, id_reduce, row_splits, mask=None):
        w = self.param(
            "weight",
            he_orthogonal,
            (self.emb_size, self.emb_size_interm, self.units_out),
        )
        if self.dtype is not None:
            w = w.astype(self.dtype)
        return bil_ops.bilinear(
            rbf_W1, sph_rows, m, id_reduce, row_splits, w, mask=mask,
            implementation=self.implementation, seg_block=self.seg_block,
        )


class AtomUpdateBlock(nn.Module):
    """Edge->atom aggregation + MLP (reference atom_update_block.py:9-72)."""

    emb_size_atom: int
    emb_size_edge: int
    n_hidden: int
    activation: Optional[str] = None
    scale_name: str = "atom_update_sum"
    # halo (edge-partitioned) mode: each shard's segment-sum covers only its
    # local edges; psum the small (nAtoms, emb) accumulator (parallel/halo.py)
    psum_axis: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, m, rbf, id_target, edge_mask, atom_mask):
        n_atoms = h.shape[0]
        mlp_rbf = Dense(self.emb_size_edge, dtype=self.dtype, name="dense_rbf")(rbf)
        x = m * mlp_rbf
        x2 = masked_segment_sum(x, id_target, n_atoms, mask=edge_mask)
        if self.psum_axis:
            import jax

            x2 = jax.lax.psum(x2, self.psum_axis)
        x = ScalingFactor(self.scale_name, name="scale_sum")(
            m, x2, mask_ref=edge_mask, mask_y=atom_mask
        )
        x = Dense(self.emb_size_atom, activation=self.activation, dtype=self.dtype,
                  name="dense_0")(x)
        for i in range(self.n_hidden):
            x = ResidualLayer(
                self.emb_size_atom, activation=self.activation, dtype=self.dtype,
                name=f"res_{i}"
            )(x)
        return x


class OutputBlock(nn.Module):
    """Atom update + energy head; optional direct per-edge force head
    (reference atom_update_block.py:75-193)."""

    emb_size_atom: int
    emb_size_edge: int
    n_hidden: int
    num_targets: int
    activation: Optional[str] = None
    direct_forces: bool = True
    output_init: str = "HeOrthogonal"
    scale_prefix: str = "OutBlock_0"
    psum_axis: Optional[str] = None  # see AtomUpdateBlock
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, m, rbf, id_target, edge_mask, atom_mask):
        n_atoms = h.shape[0]
        out_init = (
            he_orthogonal
            if self.output_init.lower() == "heorthogonal"
            else nn.initializers.zeros
        )
        if self.output_init.lower() not in ("heorthogonal", "zeros"):
            raise ValueError(f"Unknown output_init: {self.output_init}")

        rbf_mlp = Dense(self.emb_size_edge, dtype=self.dtype, name="dense_rbf")(rbf)
        x = m * rbf_mlp

        # ---- energy ----
        x_E = masked_segment_sum(x, id_target, n_atoms, mask=edge_mask)
        if self.psum_axis:
            import jax

            x_E = jax.lax.psum(x_E, self.psum_axis)
        x_E = ScalingFactor(self.scale_prefix + "_sum", name="scale_sum")(
            m, x_E, mask_ref=edge_mask, mask_y=atom_mask
        )
        x_E = Dense(self.emb_size_atom, activation=self.activation, dtype=self.dtype,
                    name="dense_0")(x_E)
        for i in range(self.n_hidden):
            x_E = ResidualLayer(
                self.emb_size_atom, activation=self.activation, dtype=self.dtype,
                name=f"res_{i}"
            )(x_E)
        # no bias: atoms without edges must predict exactly zero
        x_E = Dense(self.num_targets, kernel_init=out_init, dtype=self.dtype,
                    name="out_energy")(x_E)

        # ---- forces ----
        if self.direct_forces:
            x_F = ScalingFactor(self.scale_prefix + "_had", name="scale_rbf")(
                m, x, mask_ref=edge_mask, mask_y=edge_mask
            )
            x_F = Dense(
                self.emb_size_edge, activation=self.activation, dtype=self.dtype,
                name="force_dense_0"
            )(x_F)
            for i in range(self.n_hidden):
                x_F = ResidualLayer(
                    self.emb_size_edge, activation=self.activation, dtype=self.dtype,
                    name=f"force_res_{i}"
                )(x_F)
            x_F = Dense(self.num_targets, kernel_init=out_init, dtype=self.dtype,
                        name="out_forces")(x_F)
        else:
            x_F = jnp.zeros((m.shape[0], self.num_targets), x_E.dtype)
        return x_E, x_F
