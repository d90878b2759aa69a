"""Tensor parallelism: model width sharded over a `tp` mesh via GSPMD.

Unlike dp/ep/halo/pp (explicit shard_map programs), tp uses the idiomatic
XLA route: annotate PARAMETER shardings on the mesh and let the SPMD
partitioner propagate them through the program and insert the collectives
(the scaling-book recipe: pick a mesh, shard the params, let XLA do the
rest). No reference counterpart (single GPU).

Sharding rules (tp_param_specs):
- Dense `kernel` (in, out)           -> P(None, "tp")   column-parallel
- bilinear `weight` (emb, I, out)    -> P(None, None, "tp")
- atom-embedding table (93, emb)     -> P(None, "tp")
- scalars / frequencies / scales     -> replicated

Parameters, their Adam moments (when the jitted train step inherits these
shardings), and the matmul FLOPs shard 1/N; per-row activations are small
relative to weights only for very wide configs, so tp is the right axis
when emb sizes grow beyond one chip's sweet spot, and it composes freely
with dp (2-D mesh) since it is pure GSPMD.

The fused Pallas segment kernels have no SPMD partitioning rule, so under
tp XLA keeps their operands/results replicated (it reshards around the
custom call); the dense layers — where the weight FLOPs live — still
partition. For a fully-sharded hot path at scale, combine tp for the dense
stack with halo (rung 2b) for the row spaces instead.

Exactness: GSPMD is semantics-preserving by construction; asserted anyway
in tests/test_tp.py against the single-device model (forward, -dE/dR
forces, and parameter gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "tp"


def tp_param_specs(variables, mesh: Mesh, axis: str = AXIS):
    """PartitionSpec pytree for GemNet variables (see module docstring).

    Leaves whose to-be-sharded dim isn't divisible by the axis size stay
    replicated (e.g. the (emb, 1) energy/force heads): device_put requires
    even chunks, and those tails are negligible weight anyway."""
    size = mesh.shape[axis]

    def spec(path, x):
        name = getattr(path[-1], "key", None) if path else None
        if name == "kernel" and x.ndim == 2 and x.shape[1] % size == 0:
            return P(None, axis)
        if name == "weight" and x.ndim == 3 and x.shape[2] % size == 0:
            return P(None, None, axis)
        if name == "embeddings" and x.ndim == 2 and x.shape[1] % size == 0:
            return P(None, axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, variables)


def shard_tp_variables(variables, mesh: Mesh, axis: str = AXIS):
    """Place variables on the tp mesh with tp_param_specs shardings."""
    specs = tp_param_specs(variables, mesh, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        variables,
        specs,
    )


def make_tp_energy_and_forces(model, mesh: Mesh, axis: str = AXIS):
    """jitted (variables, batch) -> (E, F) with variables tp-sharded and
    batch/outputs replicated; the variant-appropriate force path (the
    -dE/dR double backward partitions along with the forward)."""
    from ..models import energy_and_forces

    repl = NamedSharding(mesh, P())

    def fn(variables, batch):
        E, F, _ = energy_and_forces(model, variables, batch)
        return E, F

    return jax.jit(fn, out_shardings=(repl, repl))


def make_tp_loss_and_grad(model, mesh: Mesh, loss_fn, axis: str = AXIS):
    """jitted (variables, batch) -> (loss, grads); grads inherit the
    parameters' tp shardings (XLA keeps the transpose sharded), so a
    downstream optimizer update stays 1/N per chip."""
    from ..models import energy_and_forces

    def loss(variables, batch):
        E, F, _ = energy_and_forces(model, variables, batch)
        return loss_fn(E, F, batch)

    return jax.jit(jax.value_and_grad(loss))
