"""Scaling-factor bookkeeping: naming, JSON I/O, fit ordering.

The reference manages 35 activation-variance scale factors through a
class-level queue state machine (gemnet/model/layers/scaling.py:7-147) driven
by module creation order. Here scales live in the flax `scale_factors`
variable collection keyed by the same global names
(pretrained/scaling_factors.json schema), and the fit order is a pure
function of the model config.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModelConfig
from ..utils.jsonio import read_json, update_json


def scale_names_in_creation_order(cfg: ModelConfig) -> list[str]:
    """Fit queue order = reference module creation order
    (gemnet.py:220-256; interaction_block.py:84-138; atom_update_block.py:41,133-141)."""
    names: list[str] = []
    for i in range(1, cfg.num_blocks + 1):
        if not cfg.triplets_only:
            names += [
                f"QuadInteraction_{i}_had_rbf",
                f"QuadInteraction_{i}_had_cbf",
                f"QuadInteraction_{i}_sum_sbf",
            ]
        names += [
            f"TripInteraction_{i}_had_rbf",
            f"TripInteraction_{i}_sum_cbf",
            f"AtomUpdate_{i}_sum",
        ]
    for j in range(cfg.num_blocks + 1):
        names.append(f"OutBlock_{j}_sum")
        if cfg.direct_forces:
            names.append(f"OutBlock_{j}_had")
    return names


def _map_scale_leaves(tree, fn, path=()):
    if isinstance(tree, dict):
        return {k: _map_scale_leaves(v, fn, path + (k,)) for k, v in tree.items()}
    return fn(path, tree)


def load_scales_from_json(scale_tree: dict, scale_file: str) -> dict:
    """Overwrite scale leaves from a scaling_factors.json (leaf key = global
    name; reference scaling.py:68-81 load path)."""
    content = read_json(scale_file)

    def replace(path, leaf):
        name = path[-1]
        if name in content:
            return jnp.asarray(float(content[name]), jnp.float32)
        return leaf

    return _map_scale_leaves(scale_tree, replace)


def scales_to_dict(scale_tree: dict) -> dict[str, float]:
    out: dict[str, float] = {}

    def visit(path, leaf):
        out[path[-1]] = float(leaf)
        return leaf

    _map_scale_leaves(scale_tree, visit)
    return out


def set_scale_by_name(scale_tree: dict, name: str, value: float) -> dict:
    def replace(path, leaf):
        if path[-1] == name:
            return jnp.asarray(float(value), jnp.float32)
        return leaf

    return _map_scale_leaves(scale_tree, replace)


def save_scales_json(scale_tree: dict, scale_file: str) -> None:
    update_json(scale_file, scales_to_dict(scale_tree))
