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


# ======================================================================
# dp x halo (rung 2b inside each dp group) — the production layout:
# molecule batches across dp, each batch fully edge-partitioned over ep
# with halo all-to-alls (parallel/halo.py). Per-chip memory and edge-level
# FLOPs shrink with n_ep AND the global batch grows with n_dp.
# ======================================================================


def build_dp_halo_batch(graph_tuples, n_ep: int, triplets_only: bool = False,
                        pads=None):
    """Halo-partition each dp shard's graph over `n_ep` with ONE common
    HaloPads so the stacked shapes agree.

    graph_tuples: per-dp-shard (g, Z, R, E, F) tuples.
    Returns (stacked_batch, pads_used): halo SHARDED_KEYS get a leading
    (n_dp, n_ep, ...) axis, replicated-within-group keys get (n_dp, ...).
    Pass `pads` (e.g. from a previous call or estimate_halo_pads) to keep one
    static shape across training batches.
    """
    from .halo import build_halo_partition, device_batch_halo

    def part(tup, pads):
        g, Z, R, E, F = tup
        return build_halo_partition(
            g, Z, R, n_ep, E=E, F=F, triplets_only=triplets_only, pads=pads)

    first = [part(t, pads) for t in graph_tuples]
    common = first[0]["halo_pads"]
    for p in first[1:]:
        common = common.grow_to(p["halo_pads"])
    # rebuild any shard whose natural sizes were below the common pads
    parts = [
        p if p["halo_pads"] == common else part(t, common)
        for p, t in zip(first, graph_tuples)
    ]
    stacked = {
        k: np.stack([device_batch_halo(p)[k] for p in parts])
        for k in device_batch_halo(parts[0])
    }
    return stacked, common


def dp_halo_in_specs(batch: dict) -> dict:
    from .halo import SHARDED_KEYS

    return {
        k: P(DP_AXIS, EP_AXIS) if k in SHARDED_KEYS else P(DP_AXIS)
        for k in batch
    }


def shard_dp_halo_batch(batch: dict, mesh: Mesh) -> dict:
    specs = dp_halo_in_specs(batch)
    return {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }


def _dp_halo_local(batch: dict) -> dict:
    from .halo import SHARDED_KEYS

    return {
        k: (v[0, 0] if k in SHARDED_KEYS else v[0]) for k, v in batch.items()
    }


def make_dp_halo_loss_and_grad(model, mesh: Mesh, loss_parts_fn):
    """(variables, dp_halo_batch) -> (loss, grads), exact global gradients:
    jax.grad OUTSIDE the vma-tracked shard_map transposes the halo
    all_to_alls (ep) and the num/den psums (dp) exactly.

    loss_parts_fn(E, F, local_batch) -> (numerator, denominator); the global
    loss is psum(num over dp) / psum(den over dp).
    """
    from ..models.gemnet import energy_and_forces, make_model
    from .halo import EP_AXIS as HALO_AXIS

    halo_model = make_model(
        dataclasses.replace(model.config, ep_axis=HALO_AXIS, ep_halo=True)
    )

    def device_loss(variables, batch):
        local = _dp_halo_local(batch)
        E, F, _ = energy_and_forces(halo_model, variables, local)
        num, den = loss_parts_fn(E, F, local)
        num = jax.lax.psum(num, DP_AXIS)
        den = jax.lax.psum(den, DP_AXIS)
        return num / jnp.maximum(den, 1.0)

    def loss_and_grad(variables, batch):
        sharded = jax.shard_map(
            device_loss, mesh=mesh,
            in_specs=(P(), dp_halo_in_specs(batch)), out_specs=P(),
            check_vma=True,
        )
        return jax.value_and_grad(lambda v: sharded(v, batch))(variables)

    return jax.jit(loss_and_grad)


def make_dp_halo_eval_step(trainer, mesh: Mesh):
    """Evaluation on the dp x halo mesh: (params, scales, batch) ->
    (metrics, counts) as GLOBAL ratios (psum over dp), replicated — the eval
    counterpart of make_dp_halo_train_step for EMA-swapped validation."""
    from ..models.gemnet import make_model
    from .halo import EP_AXIS as HALO_AXIS

    halo_model = make_model(
        dataclasses.replace(trainer.model.config, ep_axis=HALO_AXIS,
                            ep_halo=True)
    )

    def device_metrics(params, scales, batch):
        _, (metrics, counts) = trainer._loss_and_metrics(
            params, scales, _dp_halo_local(batch),
            axis_name=DP_AXIS, model=halo_model,
        )
        return metrics, counts

    def eval_step(params, scales, batch):
        sharded = jax.shard_map(
            device_metrics, mesh=mesh,
            in_specs=(P(), P(), dp_halo_in_specs(batch)),
            out_specs=(P(), P()), check_vma=True,
        )
        return sharded(params, scales, batch)

    return jax.jit(eval_step)


def make_dp_halo_train_step(trainer, mesh: Mesh):
    """Full training step on the dp x halo mesh: the trainer's loss in global
    num/den form (psum over dp), halo execution over ep inside each group,
    exact gradients (grad outside the vma-tracked shard_map), then the
    trainer's optimizer/EMA/metric update. (state, batch, lr_scale) ->
    (state, metrics)."""
    from ..models.gemnet import make_model
    from .halo import EP_AXIS as HALO_AXIS

    assert (
        trainer.unravel if trainer.flat else trainer.optimizer
    ) is not None, "call trainer.init_state first"
    halo_model = make_model(
        dataclasses.replace(trainer.model.config, ep_axis=HALO_AXIS,
                            ep_halo=True)
    )

    def device_metrics(params, scales, batch):
        # axis_name=DP psums the num/den parts; metrics are GLOBAL ratios.
        # The local loss term (made for dp.py's grad-inside + manual-psum
        # pattern) varies over dp and must not leave the vma-tracked
        # shard_map; the differentiated scalar below is metrics["loss"],
        # whose psum transposes exactly with jax.grad outside.
        _, (metrics, counts) = trainer._loss_and_metrics(
            params, scales, _dp_halo_local(batch),
            axis_name=DP_AXIS, model=halo_model,
        )
        return metrics, counts

    def step(state, batch, lr_scale):
        def loss_fn(params):
            sharded = jax.shard_map(
                lambda p, b: device_metrics(p, state.scales, b),
                mesh=mesh,
                in_specs=(P(), dp_halo_in_specs(batch)),
                out_specs=(P(), P()),
                check_vma=True,
            )
            metrics, counts = sharded(params, batch)
            return metrics["loss"], (metrics, counts)

        (loss, (metrics, counts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return trainer.apply_update(state, grads, metrics, counts, lr_scale), metrics

    return jax.jit(step)
