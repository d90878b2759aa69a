"""Composed dp x ep execution: molecule shards x row partitions on a 2-D mesh.

Each `dp` group owns one padded batch of molecules; within a group, the
batch's triplet/quadruplet row spaces are partitioned over `ep`
(parallel/ep.py). Under a vma-tracked shard_map the loss is simply the global
masked mean — numerator and denominator psum'd over `dp` — with the model's
internal bilinear psums riding `ep`; `jax.grad` OUTSIDE the shard_map then
yields exact global gradients for the whole composition (the same property
tests/test_edge_partition.py establishes for ep alone).

This is the full BASELINE.md scaling shape: batch parallelism across hosts /
chips (dp) multiplied by intra-graph partitioning (ep) for systems larger
than one chip's row spaces.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ep import EP_AXIS, QUAD_ROW_KEYS, TRIP_ROW_KEYS, partition_batch

DP_AXIS = "dp"

_ROW_KEYS = set(TRIP_ROW_KEYS) | set(QUAD_ROW_KEYS) | {
    "trip_row_splits", "quad_row_splits",
}


def make_hybrid_mesh(n_dp: int, n_ep: int) -> Mesh:
    devices = jax.devices()
    assert n_dp * n_ep <= len(devices)
    return Mesh(
        np.asarray(devices[: n_dp * n_ep]).reshape(n_dp, n_ep),
        (DP_AXIS, EP_AXIS),
    )


def build_hybrid_batch(batches: list[dict], n_ep: int) -> dict:
    """Stack dp shards of ep-partitioned batches:
    row arrays -> (n_dp, n_ep, rows...), others -> (n_dp, ...).
    A common per-ep-shard chunk size is used across dp shards so the stacked
    shapes agree."""
    from .ep import ROW_BLOCK

    def common_chunk(key, mask_key):
        worst = max(int(b[mask_key].sum()) for b in batches)
        per = -(-worst // n_ep)
        return -(-max(per, 1) // ROW_BLOCK) * ROW_BLOCK

    trip_chunk = common_chunk("id3_reduce_ca", "trip_mask")
    quad_chunk = (
        common_chunk("id4_reduce_ca", "quad_mask")
        if "id4_reduce_ca" in batches[0] else None
    )
    parts = [
        partition_batch(b, n_ep, trip_chunk=trip_chunk, quad_chunk=quad_chunk)
        for b in batches
    ]
    keys = parts[0].keys()
    return {k: np.stack([p[k] for p in parts]) for k in keys}


def hybrid_in_specs(batch: dict) -> dict:
    return {
        k: P(DP_AXIS, EP_AXIS) if k in _ROW_KEYS else P(DP_AXIS)
        for k in batch
    }


def shard_hybrid_batch(batch: dict, mesh: Mesh) -> dict:
    specs = hybrid_in_specs(batch)
    return {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }


def make_hybrid_loss_and_grad(model, mesh: Mesh, loss_parts_fn):
    """(variables, hybrid_batch) -> (loss, grads), exact global gradients.

    loss_parts_fn(E, F, local_batch) -> (numerator, denominator); the global
    loss is psum(num over dp) / psum(den over dp). Row-space psums inside the
    model ride the ep axis.
    """
    from ..models.gemnet import energy_and_forces, make_model

    ep_model = make_model(dataclasses.replace(model.config, ep_axis=EP_AXIS))

    def device_loss(variables, batch):
        local = {}
        for k, v in batch.items():
            local[k] = v[0, 0] if k in _ROW_KEYS else v[0]
        E, F, _ = energy_and_forces(ep_model, variables, local)
        num, den = loss_parts_fn(E, F, local)
        num = jax.lax.psum(num, DP_AXIS)
        den = jax.lax.psum(den, DP_AXIS)
        return num / jnp.maximum(den, 1.0)

    def loss_and_grad(variables, batch):
        sharded = jax.shard_map(
            device_loss, mesh=mesh,
            in_specs=(P(), hybrid_in_specs(batch)), out_specs=P(),
            check_vma=True,
        )
        return jax.value_and_grad(lambda v: sharded(v, batch))(variables)

    return jax.jit(loss_and_grad)
