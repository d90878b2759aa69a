"""Data-parallel training over a device mesh (shard_map + psum over ICI).

Each device owns one padded subgraph (a shard of molecules); parameters,
optimizer state, and EMA shadows are replicated. The per-device loss is
computed in global num/den form (trainer.masked_* with axis_name), so the
psum'd gradients are the exact gradients of the global masked mean — bitwise
consistent with single-device training on the concatenated batch up to fp
reduction order.

The reference has no counterpart (single GPU only); this is the first rung of
the BASELINE.md scaling ladder (1 chip -> 1 host -> N hosts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..training.trainer import Trainer, TrainState

AXIS = "dp"


def stack_shards(batches):
    """Stack per-device batches (dicts or packed buffers) into
    leading-device-axis arrays."""
    if isinstance(batches[0], dict):
        keys = batches[0].keys()
        return {k: np.stack([b[k] for b in batches]) for k in keys}
    return np.stack(batches)


def make_dp_train_step(trainer: Trainer, mesh: Mesh):
    """jitted (state, stacked_batch, lr_scale) -> (state, metrics, counts).

    stacked_batch arrays have shape (n_dev, ...) and are sharded over dp;
    state is replicated.
    """
    assert (
        trainer.unravel if trainer.flat else trainer.optimizer
    ) is not None, "call trainer.init_state first"

    def device_step(state: TrainState, batch, lr_scale):
        # shard_map passes the per-device slice with the leading axis kept;
        # batches may arrive packed (BatchPacker) or as dicts
        if isinstance(batch, dict):
            batch = {k: v[0] for k, v in batch.items()}
        else:
            batch = trainer.packer.unpack(batch[0])
        grad_fn = jax.value_and_grad(
            lambda p: trainer._loss_and_metrics(
                p, state.scales, batch, axis_name=AXIS
            ),
            has_aux=True,
        )
        (loss, (metrics, counts)), grads = grad_fn(state.params)
        # flat mode: ONE collective for the whole gradient (vs one per leaf)
        grads = jax.lax.psum(grads, AXIS)
        new_state = trainer.apply_update(state, grads, metrics, counts, lr_scale)
        return new_state, metrics, counts

    sharded = jax.shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_predict_fn(model, mesh: Mesh):
    """Sharded batched inference: jitted (variables, stacked_batch) -> (E, F)
    with the leading device axis preserved. Each device runs the full model
    (energy + the model's force path, incl. -dE/dR via jax.grad inside the
    shard) on its own padded shard; variables are replicated. This is the
    serving counterpart of make_dp_train_step — throughput scales with mesh
    size, no collectives on the hot path. (Reference counterpart:
    gemnet.py:780-784 `predict`, single GPU.)"""
    from ..models import energy_and_forces

    def device_predict(variables, batch):
        batch = {k: v[0] for k, v in batch.items()}
        E, F, _ = energy_and_forces(model, variables, batch)
        return E[None], F[None]

    sharded = jax.shard_map(
        device_predict,
        mesh=mesh,
        in_specs=(P(), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_eval_step(trainer: Trainer, mesh: Mesh):
    """(params, scales, stacked_batch) -> (metrics, counts) as GLOBAL masked
    ratios (psum over dp), replicated. Accepts dict batches or packed int32 word
    rows (BatchPacker) like the train step; a remainder group can be padded
    with `trainer.packer.zero_masks(row)` copies, which contribute zero to
    every num/den pair."""
    def device_eval(params, scales, batch):
        if isinstance(batch, dict):
            batch = {k: v[0] for k, v in batch.items()}
        else:
            batch = trainer.packer.unpack(batch[0])
        _, (metrics, counts) = trainer._loss_and_metrics(
            params, scales, batch, axis_name=AXIS
        )
        return metrics, counts

    sharded = jax.shard_map(
        device_eval,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_batch_to_mesh(stacked, mesh: Mesh):
    """Put a host-stacked batch onto the dp mesh.

    Single-process: `stacked` has the full (n_dev, ...) leading axis.
    Multi-process (jax.distributed initialized, mesh spans all processes):
    `stacked` holds only this process's LOCAL shards
    (n_local_dev = n_dev / process_count leading axis) and the global array
    is assembled across hosts (multihost_utils)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def put(v):
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(v), mesh, P(AXIS)
            )
    else:
        sharding = NamedSharding(mesh, P(AXIS))

        def put(v):
            return jax.device_put(jnp.asarray(v), sharding)

    if isinstance(stacked, dict):
        return {k: put(v) for k, v in stacked.items()}
    return put(stacked)
