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


def _to_host(tree: Any) -> Any:
    """Fetch the payload to host numpy in one pass before orbax sees it.

    Handing device arrays to orbax triggers its jitted sharding/transfer
    helpers; on the tunneled TPU runtime those pay remote compiles — a
    measured 85 s first-save stall (vs 1 s after caching, 0.2 s on CPU;
    artifacts_r02_tpu_session3.md). A plain device_get is a pure transfer,
    no compile, and the state is a handful of flat buffers."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "dtype") else x, jax.device_get(tree)
    )


def save_checkpoint(
    path: str, state: TrainState, plateau: Optional[PlateauState] = None
) -> None:
    path = _abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_host(state), force=True)
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
        ckptr.save(path, _to_host(payload), force=True)


def restore_params(path: str, target: dict) -> dict:
    path = _abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)
