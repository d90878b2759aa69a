"""Device mesh construction and sharding helpers.

The reference is strictly single-device (SURVEY.md §2 callout: no DDP, no
torch.distributed anywhere). Multi-chip execution is therefore a new
first-class layer here, built on jax.sharding: a 1-D "dp" mesh shards whole
padded subgraphs (molecule-level data parallelism); the edge-partitioned
path (north star) extends this with an "ep" axis in later rounds.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n <= len(devices), f"need {n} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:n]).reshape((n,) + (1,) * (len(axis_names) - 1)),
                axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up via jax.distributed (DCN-spanning pods)."""
    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
