"""Edge-partitioned model execution (BASELINE.md north star, rung 2).

Molecule-sharded DP (dp.py) caps the largest tractable system at one chip;
this partitions a SINGLE batched graph across chips by rows of its
triplet/quadruplet spaces — where ~all FLOPs live — while the small
atom/edge-level tensors stay replicated:

- The canonical row spaces are sorted by reduce edge (data/padding.py), so
  contiguous row chunks partition them; each shard keeps GLOBAL edge ids, and
  its fused segment-outer-sum emits a full-width (S, nEdges, M) accumulation
  that is nonzero only on its own edge band.
- The bilinear contraction is linear in that accumulation, so shards combine
  with one `psum` of the bilinear OUTPUT — (nEdges, units_out), a few hundred
  KB per interaction block over ICI — not of the row spaces. NOTE the
  measured total: AD through the vma-tracked shard_map also all-reduces the
  cotangents of every replicated operand consumed by the varying rows (the
  rbf/cbf streams and intermediate-edge embeddings), so a full train step
  moves ~213 MB/shard of collectives at the flagship small-bench shape
  (jaxpr census, artifacts_r02_comm.md) — inherent to rung 2a's
  replicate-the-edge-spaces design. The halo mode (rung 2b, parallel/halo.py)
  shards those spaces and measures 25.6 MB/shard on the same batch; prefer
  it when comm dominates.
- Everything else (edge hadamards, atom update, output blocks, energy/force
  aggregation) is edge/atom-level, orders of magnitude cheaper than the row
  spaces, and computes replicated — bitwise identical on every chip, no
  communication.

Gradient correctness: the partitioned model mixes replicated computation
(identical on every shard) with varying row computation — a manual
(check_vma=False) shard_map transpose cannot tell their cotangents apart and
over-counts the replicated paths n×. Running the shard_map with
`check_vma=True` lets JAX's varying-manual-axes tracking transpose both
correctly; with that, plain `lax.psum` gives EXACT energies, exact forces on
both force paths (direct head and the inner -dE/dR jax.grad), and exact
training gradients when differentiated outside the shard_map — all verified
against the single-device model in tests/test_edge_partition.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.padding import EDGE_BLOCK, ROW_BLOCK, _row_splits, strip_sort_metadata

EP_AXIS = "ep"

# batch keys living on the triplet row space
TRIP_ROW_KEYS = ("id3_reduce_ca", "id3_expand_ba", "trip_mask")
# batch keys living on the quadruplet row space
QUAD_ROW_KEYS = (
    "id4_reduce_ca", "id4_expand_db", "id4_reduce_cab", "id4_expand_abd",
    "quad_mask",
)


def psum_replicated_grad(x, axis_name: str):
    """Cross-shard sum of the bilinear outputs. Plain lax.psum: under
    check_vma=True the AD through it is exact for this mixed
    replicated/varying program (see module docstring)."""
    return jax.lax.psum(x, axis_name)


def _split_rows(ids, mask, extras, n_shards, n_edges_pad, chunk=None):
    """Split one sorted row space into n_shards contiguous padded chunks."""
    n_real = int(mask.sum())
    bounds = [round(n_real * s / n_shards) for s in range(n_shards + 1)]
    need = max(b1 - b0 for b0, b1 in zip(bounds, bounds[1:]))
    need = -(-max(need, 1) // ROW_BLOCK) * ROW_BLOCK  # pad to kernel chunks
    # a caller-fixed chunk keeps shapes (and compiles) stable across batches;
    # grow-only on outlier batches that don't fit it
    chunk = need if chunk is None else max(chunk, need)
    pad_id = ids[-1] if len(ids) else 0  # max id (padding keeps sortedness)

    out_ids = np.full((n_shards, chunk), pad_id, ids.dtype)
    out_mask = np.zeros((n_shards, chunk), np.bool_)
    out_extras = {
        k: np.zeros((n_shards, chunk), v.dtype) for k, v in extras.items()
    }
    out_splits = np.zeros((n_shards, n_edges_pad // EDGE_BLOCK + 1), np.int32)
    for s in range(n_shards):
        b0, b1 = bounds[s], bounds[s + 1]
        n = b1 - b0
        out_ids[s, :n] = ids[b0:b1]
        out_mask[s, :n] = True
        for k, v in extras.items():
            out_extras[k][s, :n] = v[b0:b1]
        out_splits[s] = _row_splits(out_ids[s], n_edges_pad)
    return out_ids, out_mask, out_extras, out_splits


def partition_batch(
    batch: dict[str, np.ndarray], n_shards: int,
    trip_chunk: int | None = None, quad_chunk: int | None = None,
) -> dict:
    """Host-side row partitioner: returns a batch whose row-space arrays have
    a leading (n_shards,) axis; all other keys replicated unchanged.
    Optional fixed chunk sizes keep shapes identical across dp shards
    (parallel/hybrid.py)."""
    n_edges_pad = len(batch["id_c"])
    out = dict(batch)

    ids, mask, extras, splits = _split_rows(
        batch["id3_reduce_ca"], batch["trip_mask"],
        {"id3_expand_ba": batch["id3_expand_ba"]}, n_shards, n_edges_pad,
        chunk=trip_chunk,
    )
    out["id3_reduce_ca"] = ids
    out["trip_mask"] = mask
    out["id3_expand_ba"] = extras["id3_expand_ba"]
    out["trip_row_splits"] = splits

    if "id4_reduce_ca" in batch:
        extras_in = {
            k: batch[k] for k in ("id4_expand_db", "id4_reduce_cab", "id4_expand_abd")
        }
        ids, mask, extras, splits = _split_rows(
            batch["id4_reduce_ca"], batch["quad_mask"], extras_in,
            n_shards, n_edges_pad, chunk=quad_chunk,
        )
        out["id4_reduce_ca"] = ids
        out["quad_mask"] = mask
        out.update(extras)
        out["quad_row_splits"] = splits
    # sorted-VJP gather metadata is a single-device layout contract
    # (data/padding.py SORT_META_KEYS): sliced row spaces invalidate the
    # global perms, and the one space ep keeps replicated (intm_db) would
    # route its custom-vjp gather through the ep shard_map's mixed
    # invariant/variant inputs, tripping JAX's vma (pvary) handling — strip
    # them all; ep uses plain gathers.
    strip_sort_metadata(out)
    return out


def ep_in_specs(batch: dict) -> dict:
    """PartitionSpec tree for a partitioned batch (P('ep') on row spaces)."""
    row_keys = set(TRIP_ROW_KEYS) | set(QUAD_ROW_KEYS) | {
        "trip_row_splits", "quad_row_splits",
    }
    return {k: P(EP_AXIS) if k in row_keys else P() for k in batch}


def make_ep_apply(model, mesh: Mesh, with_forces: bool = True):
    """shard_map-wrapped (variables, partitioned_batch) -> (E, F).

    The model runs with config.ep_axis set so the bilinear outputs psum over
    the mesh's `ep` axis; returns replicated outputs.
    """
    from ..models.gemnet import energy_and_forces, make_model

    ep_model = make_model(dataclasses.replace(model.config, ep_axis=EP_AXIS))
    row_keys = set(TRIP_ROW_KEYS) | set(QUAD_ROW_KEYS) | {
        "trip_row_splits", "quad_row_splits",
    }

    def device_fn(variables, batch):
        local = {k: (v[0] if k in row_keys else v) for k, v in batch.items()}
        E, F, _ = energy_and_forces(ep_model, variables, local)
        return E, F

    def apply(variables, batch):
        sharded = jax.shard_map(
            device_fn, mesh=mesh, in_specs=(P(), ep_in_specs(batch)),
            out_specs=(P(), P()), check_vma=True,
        )
        return sharded(variables, batch)

    return jax.jit(apply)


def make_ep_loss_and_grad(model, mesh: Mesh, loss_fn):
    """(variables, partitioned_batch) -> (loss, grads) with EXACT gradients:
    the jax.grad sits OUTSIDE the vma-tracked shard_map.

    loss_fn(E, F, local_batch) -> scalar (replicated inputs).
    """
    from ..models.gemnet import energy_and_forces, make_model

    ep_model = make_model(dataclasses.replace(model.config, ep_axis=EP_AXIS))
    row_keys = set(TRIP_ROW_KEYS) | set(QUAD_ROW_KEYS) | {
        "trip_row_splits", "quad_row_splits",
    }

    def device_loss(variables, batch):
        local = {k: (v[0] if k in row_keys else v) for k, v in batch.items()}
        E, F, _ = energy_and_forces(ep_model, variables, local)
        return loss_fn(E, F, local)

    def loss_and_grad(variables, batch):
        sharded = jax.shard_map(
            device_loss, mesh=mesh, in_specs=(P(), ep_in_specs(batch)),
            out_specs=P(), check_vma=True,
        )
        return jax.value_and_grad(lambda v: sharded(v, batch))(variables)

    return jax.jit(loss_and_grad)


def make_ep_train_step(trainer, mesh: Mesh):
    """Full training step over an ep mesh: exact gradients (jax.grad outside
    the vma-tracked shard_map), then the trainer's optimizer/EMA update and
    device-side metric accumulation — the ep counterpart of
    dp.make_dp_train_step. Returns (state, batch, lr_scale) -> (state, metrics).
    """
    assert (
        trainer.unravel if trainer.flat else trainer.optimizer
    ) is not None, "call trainer.init_state first"
    ep_model = make_model_ep(trainer.model)
    row_keys = set(TRIP_ROW_KEYS) | set(QUAD_ROW_KEYS) | {
        "trip_row_splits", "quad_row_splits",
    }

    def device_metrics(params, scales, batch):
        local = {k: (v[0] if k in row_keys else v) for k, v in batch.items()}
        # the trainer's loss with the ep-axis model (replicated outputs)
        return trainer._loss_and_metrics(params, scales, local, model=ep_model)

    def step(state, batch, lr_scale):
        def loss_fn(params):
            sharded = jax.shard_map(
                lambda p, b: device_metrics(p, state.scales, b),
                mesh=mesh,
                in_specs=(P(), ep_in_specs(batch)),
                out_specs=(P(), (P(), P())),
                check_vma=True,
            )
            return sharded(params, batch)

        (loss, (metrics, counts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return trainer.apply_update(state, grads, metrics, counts, lr_scale), metrics

    return jax.jit(step)


def make_model_ep(model):
    from ..models.gemnet import make_model

    return make_model(dataclasses.replace(model.config, ep_axis=EP_AXIS))


def shard_ep_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a partitioned batch with row spaces sharded over ep."""
    specs = ep_in_specs(batch)
    return {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }
