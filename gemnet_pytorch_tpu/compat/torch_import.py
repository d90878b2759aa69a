"""Import reference PyTorch GemNet checkpoints into flax variables.

The reference ships `.pth` state dicts (reference gemnet.py:786-790) and a
TF-checkpoint importer (gemnet.py:617-778). This is the equivalent bridge for
the TPU framework: it maps a reference state_dict (name -> array) onto this
package's flax parameter/scale pytrees, so reference-trained weights run
unchanged — and so parity tests can compare layer-for-layer.

Layout differences handled here:
- torch Linear kernels are (out, in); flax kernels are (in, out) -> transpose.
- 3D efficient weights (down-projection / bilinear) share the same layout.
- scale factors go to the `scale_factors` collection keyed by global name.
"""

from __future__ import annotations

import re
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from ..models.scaling import set_scale_by_name


def _set(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"path {path} missing at {p}; have {list(node)}")
        node = node[p]
    if path[-1] not in node:
        raise KeyError(f"leaf {path} missing; have {list(node)}")
    expected = node[path[-1]].shape
    if tuple(expected) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {path}: {expected} vs {value.shape}")
    node[path[-1]] = jnp.asarray(value)


def _residual_path(prefix: tuple[str, ...], j: int, k: int) -> tuple[str, ...]:
    return prefix + (f"dense_{k}", "Dense_0", "kernel")


def map_reference_name(name: str) -> tuple[str, tuple[str, ...], bool] | None:
    """Map a canonical reference param name to (collection, flax path,
    transpose). Returns None for names to skip (duplicate aliases)."""
    name = name.replace(".linear.", ".")  # reference Dense aliases its Linear

    if name == "rbf_basis.frequencies":
        return ("params", ("frequencies",), False)
    if name == "atom_emb.embeddings.weight":
        return ("params", ("atom_emb", "embeddings"), False)
    if name == "edge_emb.dense.weight":
        return ("params", ("edge_emb", "dense", "Dense_0", "kernel"), True)

    m = re.fullmatch(r"mlp_(rbf4|cbf4|rbf3|rbf_h|rbf_out)\.weight", name)
    if m:
        return ("params", (f"mlp_{m.group(1)}", "Dense_0", "kernel"), True)
    m = re.fullmatch(r"mlp_(sbf4|cbf3)\.weight", name)
    if m:
        return ("params", (f"mlp_{m.group(1)}", "weight"), False)

    m = re.fullmatch(r"int_blocks\.(\d+)\.(.*)", name)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        base = (f"int_blocks_{i}",)
        mm = re.fullmatch(r"dense_ca\.weight", rest)
        if mm:
            return ("params", base + ("dense_ca", "Dense_0", "kernel"), True)
        mm = re.fullmatch(
            r"(quad|trip)_interaction\.(dense_db|dense_ba|mlp_rbf|mlp_cbf|"
            r"down_projection|up_projection_ca|up_projection_ac)\.weight",
            rest,
        )
        if mm:
            kind, layer = mm.group(1), mm.group(2)
            sub = base + (f"{kind}_interaction", layer)
            # trip mlp_cbf is the 3D bilinear; quad mlp_cbf is a 2D Dense
            if kind == "trip" and layer == "mlp_cbf":
                return ("params", sub + ("weight",), False)
            return ("params", sub + ("Dense_0", "kernel"), True)
        mm = re.fullmatch(r"quad_interaction\.mlp_sbf\.weight", rest)
        if mm:
            return ("params", base + ("quad_interaction", "mlp_sbf", "weight"), False)
        mm = re.fullmatch(
            r"(layers_before_skip|layers_after_skip|residual_m)\.(\d+)\.dense_mlp\.(\d+)\.weight",
            rest,
        )
        if mm:
            stack = {"layers_before_skip": "res_bef_skip", "layers_after_skip": "res_aft_skip",
                     "residual_m": "res_m"}[mm.group(1)]
            j, k = int(mm.group(2)), int(mm.group(3))
            return ("params", base + (f"{stack}_{j}", f"dense_{k}", "Dense_0", "kernel"), True)
        mm = re.fullmatch(r"atom_update\.dense_rbf\.weight", rest)
        if mm:
            return ("params", base + ("atom_update", "dense_rbf", "Dense_0", "kernel"), True)
        mm = re.fullmatch(r"atom_update\.layers\.0\.weight", rest)
        if mm:
            return ("params", base + ("atom_update", "dense_0", "Dense_0", "kernel"), True)
        mm = re.fullmatch(r"atom_update\.layers\.(\d+)\.dense_mlp\.(\d+)\.weight", rest)
        if mm:
            j, k = int(mm.group(1)), int(mm.group(2))
            return ("params", base + ("atom_update", f"res_{j-1}", f"dense_{k}", "Dense_0", "kernel"), True)
        mm = re.fullmatch(r"concat_layer\.dense\.weight", rest)
        if mm:
            return ("params", base + ("concat_layer", "dense", "Dense_0", "kernel"), True)
        if rest.endswith("scale_factor"):
            return ("scales", (rest,), False)  # handled by name below
        raise KeyError(f"unmapped reference int_block param: {name}")

    m = re.fullmatch(r"out_blocks\.(\d+)\.(.*)", name)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        base = (f"out_blocks_{i}",)
        if rest == "dense_rbf.weight":
            return ("params", base + ("dense_rbf", "Dense_0", "kernel"), True)
        if rest == "layers.0.weight":
            return ("params", base + ("dense_0", "Dense_0", "kernel"), True)
        mm = re.fullmatch(r"layers\.(\d+)\.dense_mlp\.(\d+)\.weight", rest)
        if mm:
            j, k = int(mm.group(1)), int(mm.group(2))
            return ("params", base + (f"res_{j-1}", f"dense_{k}", "Dense_0", "kernel"), True)
        if rest == "out_energy.weight":
            return ("params", base + ("out_energy", "Dense_0", "kernel"), True)
        if rest == "seq_forces.0.weight":
            return ("params", base + ("force_dense_0", "Dense_0", "kernel"), True)
        mm = re.fullmatch(r"seq_forces\.(\d+)\.dense_mlp\.(\d+)\.weight", rest)
        if mm:
            j, k = int(mm.group(1)), int(mm.group(2))
            return ("params", base + (f"force_res_{j-1}", f"dense_{k}", "Dense_0", "kernel"), True)
        if rest == "out_forces.weight":
            return ("params", base + ("out_forces", "Dense_0", "kernel"), True)
        if rest == "out_forces.bias":
            return ("params", base + ("out_forces", "Dense_0", "bias"), False)
        if rest.endswith("scale_factor"):
            return ("scales", (rest,), False)
        raise KeyError(f"unmapped reference out_block param: {name}")
    raise KeyError(f"unmapped reference param: {name}")


_SCALE_NAME_MAP = {
    "quad_interaction.scale_rbf": "QuadInteraction_{i}_had_rbf",
    "quad_interaction.scale_cbf": "QuadInteraction_{i}_had_cbf",
    "quad_interaction.scale_sbf_sum": "QuadInteraction_{i}_sum_sbf",
    "trip_interaction.scale_rbf": "TripInteraction_{i}_had_rbf",
    "trip_interaction.scale_cbf_sum": "TripInteraction_{i}_sum_cbf",
    "atom_update.scale_sum": "AtomUpdate_{i}_sum",
}


def import_reference_state_dict(
    state_dict: Mapping[str, np.ndarray], variables: dict
) -> dict:
    """Return a copy of `variables` (flax variable dict with 'params' and
    'scale_factors') with all reference weights loaded."""
    import copy

    import jax

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy tree
    params = copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, variables["params"])
    )
    scales = variables.get("scale_factors", {})

    seen: set[str] = set()
    for raw_name, value in state_dict.items():
        name = raw_name.replace(".linear.", ".")
        # OutputBlock aliases seq_energy = layers (atom_update_block.py:131):
        # drop the duplicate registration
        name = name.replace(".seq_energy.", ".layers.")
        if name in seen:
            continue
        seen.add(name)
        value = np.asarray(value)

        # scale factors
        m = re.fullmatch(r"int_blocks\.(\d+)\.(.+)\.scale_factor", name)
        if m:
            i = int(m.group(1)) + 1
            key = _SCALE_NAME_MAP[m.group(2)].format(i=i)
            scales = set_scale_by_name(scales, key, float(value))
            continue
        m = re.fullmatch(r"out_blocks\.(\d+)\.scale_(sum|rbf)\.scale_factor", name)
        if m:
            suffix = {"sum": "sum", "rbf": "had"}[m.group(2)]
            key = f"OutBlock_{m.group(1)}_{suffix}"
            scales = set_scale_by_name(scales, key, float(value))
            continue

        collection, path, transpose = map_reference_name(name)
        assert collection == "params"
        if transpose:
            value = value.T
        _set(params, path, value)

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(jnp.asarray, params)
    if scales:
        out["scale_factors"] = scales
    return out
