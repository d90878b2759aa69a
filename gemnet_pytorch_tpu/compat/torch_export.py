"""Export flax variables to the reference PyTorch `.pth` state-dict schema.

Inverse of `torch_import`: the reference saves/loads checkpoints as plain
`torch.save(model.state_dict())` blobs (reference gemnet.py:786-790), and its
state_dict carries every Dense weight twice (`X.weight` aliases
`X.linear.weight`, base_layers.py:26-27) plus the `seq_energy`/`layers` alias
in the output blocks (atom_update_block.py:131). This module enumerates that
exact key set from a `ModelConfig`, pulls the values out of this framework's
flax tree via the (already parity-tested) forward name mapping, and undoes
the layout changes (flax (in, out) kernels -> torch (out, in)).

Round-trip guarantee: `import_reference_state_dict(export_reference_state_dict
(variables, cfg), variables)` is the identity, and the exported dict is
loadable by the reference model with `load_state_dict(..., strict=True)`
(tests/test_compat.py::test_torch_export_round_trip).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from ..config import ModelConfig
from ..models.scaling import scales_to_dict
from .torch_import import map_reference_name

_SCALE_EXPORT = [
    # (torch canonical name template, global scale name template)
    ("int_blocks.{b}.trip_interaction.scale_rbf", "TripInteraction_{i}_had_rbf"),
    ("int_blocks.{b}.trip_interaction.scale_cbf_sum", "TripInteraction_{i}_sum_cbf"),
    ("int_blocks.{b}.atom_update.scale_sum", "AtomUpdate_{i}_sum"),
]
_SCALE_EXPORT_QUAD = [
    ("int_blocks.{b}.quad_interaction.scale_rbf", "QuadInteraction_{i}_had_rbf"),
    ("int_blocks.{b}.quad_interaction.scale_cbf", "QuadInteraction_{i}_had_cbf"),
    ("int_blocks.{b}.quad_interaction.scale_sbf_sum", "QuadInteraction_{i}_sum_sbf"),
]


def _canonical_weights(cfg: ModelConfig) -> Iterator[Tuple[str, bool]]:
    """Yield (canonical reference param name, is_dense). is_dense marks
    reference `Dense` leaves, which the torch state_dict registers twice
    (`.weight` + `.linear.weight`). Canonical = the de-aliased names
    `map_reference_name` accepts."""
    yield "rbf_basis.frequencies", False
    if not cfg.triplets_only:
        yield "mlp_rbf4.weight", True
        yield "mlp_cbf4.weight", True
        yield "mlp_sbf4.weight", False  # 3D efficient weight, plain Parameter
    yield "mlp_rbf3.weight", True
    yield "mlp_cbf3.weight", False
    yield "mlp_rbf_h.weight", True
    yield "mlp_rbf_out.weight", True
    yield "atom_emb.embeddings.weight", False
    yield "edge_emb.dense.weight", True

    def residual_stack(prefix: str, n: int) -> Iterator[Tuple[str, bool]]:
        for j in range(n):
            for k in (0, 1):
                yield f"{prefix}.{j}.dense_mlp.{k}.weight", True

    for b in range(cfg.num_blocks):
        p = f"int_blocks.{b}"
        yield f"{p}.dense_ca.weight", True
        if not cfg.triplets_only:
            q = f"{p}.quad_interaction"
            for layer in ("dense_db", "mlp_rbf", "mlp_cbf", "down_projection",
                          "up_projection_ca", "up_projection_ac"):
                yield f"{q}.{layer}.weight", True
            yield f"{q}.mlp_sbf.weight", False
        t = f"{p}.trip_interaction"
        for layer in ("dense_ba", "mlp_rbf", "down_projection",
                      "up_projection_ca", "up_projection_ac"):
            yield f"{t}.{layer}.weight", True
        yield f"{t}.mlp_cbf.weight", False  # trip bilinear is the 3D weight
        yield from residual_stack(f"{p}.layers_before_skip", cfg.num_before_skip)
        yield from residual_stack(f"{p}.layers_after_skip", cfg.num_after_skip)
        a = f"{p}.atom_update"
        yield f"{a}.dense_rbf.weight", True
        yield f"{a}.layers.0.weight", True
        for j in range(1, cfg.num_atom + 1):
            for k in (0, 1):
                yield f"{a}.layers.{j}.dense_mlp.{k}.weight", True
        yield f"{p}.concat_layer.dense.weight", True
        yield from residual_stack(f"{p}.residual_m", cfg.num_concat)

    for b in range(cfg.num_blocks + 1):
        p = f"out_blocks.{b}"
        yield f"{p}.dense_rbf.weight", True
        yield f"{p}.layers.0.weight", True
        for j in range(1, cfg.num_atom + 1):
            for k in (0, 1):
                yield f"{p}.layers.{j}.dense_mlp.{k}.weight", True
        yield f"{p}.out_energy.weight", True
        if cfg.direct_forces:
            yield f"{p}.seq_forces.0.weight", True
            for j in range(1, cfg.num_atom + 1):
                for k in (0, 1):
                    yield f"{p}.seq_forces.{j}.dense_mlp.{k}.weight", True
            yield f"{p}.out_forces.weight", True


def _get_leaf(params: dict, path: tuple) -> np.ndarray:
    node = params
    for p in path:
        node = node[p]
    return np.asarray(node)


def _node(params: dict, path: tuple) -> dict:
    node = params
    for p in path:
        node = node[p]
    return node


def export_reference_state_dict(variables: dict, cfg: ModelConfig) -> dict:
    """Flax variables (with 'params' + 'scale_factors') -> reference
    state_dict {name: np.ndarray} with the reference's full (aliased) key
    set, loadable by the reference model strict=True."""
    params = variables["params"]
    scales = scales_to_dict(variables.get("scale_factors", {}))
    out: dict[str, np.ndarray] = {}

    def emit(name: str, value: np.ndarray, is_dense: bool) -> None:
        variants = [name]
        if is_dense:  # Dense registers both X.weight and X.linear.weight
            stem, leaf = name.rsplit(".", 1)
            variants.append(f"{stem}.linear.{leaf}")
        for v in list(variants):
            if v.startswith("out_blocks.") and ".layers." in v:
                variants.append(v.replace(".layers.", ".seq_energy."))
        for v in variants:
            out[v] = value

    for name, is_dense in _canonical_weights(cfg):
        collection, path, transpose = map_reference_name(name)
        assert collection == "params", name
        value = _get_leaf(params, path)
        emit(name, value.T if transpose else value, is_dense)
        if is_dense and name.endswith(".weight"):
            holder = _node(params, path[:-1])
            if "bias" in holder:  # reference Dense aliases bias the same way
                emit(name[: -len("weight")] + "bias",
                     np.asarray(holder["bias"]), is_dense)

    def emit_scale(torch_name: str, global_name: str) -> None:
        if global_name not in scales:
            raise KeyError(f"scale factor {global_name} missing from variables")
        out[f"{torch_name}.scale_factor"] = np.float32(scales[global_name])

    for b in range(cfg.num_blocks):
        i = b + 1
        rows = _SCALE_EXPORT + ([] if cfg.triplets_only else _SCALE_EXPORT_QUAD)
        for torch_t, global_t in rows:
            emit_scale(torch_t.format(b=b), global_t.format(i=i))
    for b in range(cfg.num_blocks + 1):
        emit_scale(f"out_blocks.{b}.scale_sum", f"OutBlock_{b}_sum")
        if cfg.direct_forces:
            emit_scale(f"out_blocks.{b}.scale_rbf", f"OutBlock_{b}_had")
    return out


def save_reference_checkpoint(path: str, variables: dict, cfg: ModelConfig) -> None:
    """torch.save the exported state dict as a reference-loadable .pth
    (tensors, matching reference save_weights, gemnet.py:786-787)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          export_reference_state_dict(variables, cfg).items()}
    torch.save(sd, path)
