"""Checkpoint save/restore via orbax.

Counterpart of the reference's two .pth files per run (train_seml.py:336-340):
`model` (params+scales) and `training` (optimizer state, EMA shadow, step,
plateau state). Orbax writes sharded, async-capable checkpoints that restore
under any device mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

from .schedules import PlateauState
from .trainer import TrainState


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(
    path: str, state: TrainState, plateau: Optional[PlateauState] = None
) -> None:
    path = _abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if plateau is not None:
        np.savez(path + ".plateau.npz", **plateau.state_dict())


def restore_checkpoint(
    path: str, target: TrainState, plateau: Optional[PlateauState] = None
) -> tuple[TrainState, Optional[PlateauState]]:
    path = _abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, target)
    if plateau is not None and os.path.exists(path + ".plateau.npz"):
        data = np.load(path + ".plateau.npz", allow_pickle=True)
        plateau.load_state_dict({k: data[k].item() for k in data.files})
    return state, plateau


def save_params(path: str, params: Any, scales: Any = None) -> None:
    """Model-only checkpoint (reference `save_weights`, gemnet.py:789-790)."""
    path = _abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {"params": params}
    if scales:
        payload["scale_factors"] = scales
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def restore_params(path: str, target: dict) -> dict:
    path = _abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)
