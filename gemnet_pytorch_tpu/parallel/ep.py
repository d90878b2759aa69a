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
  KB per interaction block over ICI — not of the row spaces.
- Everything else (edge hadamards, atom update, output blocks, energy/force
  aggregation) is edge/atom-level, orders of magnitude cheaper than the row
  spaces, and computes replicated — bitwise identical on every chip, no
  communication.

Gradient correctness: inside shard_map, the transpose of `lax.psum` re-psums
a replicated cotangent (n_dev× double counting — the same trap documented in
dp.py). `psum_replicated_grad` pins the backward to identity: the output is
consumed replicated, so each shard's correct cotangent IS the replicated
cotangent, and shard_map's own transpose then sums the per-shard (disjoint
row) contributions into exact global gradients. Verified against the
single-device model in tests/test_edge_partition.py for values and grads.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.padding import EDGE_BLOCK, ROW_BLOCK, _row_splits

EP_AXIS = "ep"

# batch keys living on the triplet row space
TRIP_ROW_KEYS = ("id3_reduce_ca", "id3_expand_ba", "trip_mask")
# batch keys living on the quadruplet row space
QUAD_ROW_KEYS = (
    "id4_reduce_ca", "id4_expand_db", "id4_reduce_cab", "id4_expand_abd",
    "quad_mask",
)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_replicated_grad(x, axis_name: str):
    return jax.lax.psum(x, axis_name)


def _prg_fwd(x, axis_name):
    return psum_replicated_grad(x, axis_name), None


def _prg_bwd(axis_name, res, cot):
    # output consumed replicated -> per-shard cotangent is the replicated one
    return (cot,)


psum_replicated_grad.defvjp(_prg_fwd, _prg_bwd)


def _split_rows(ids, mask, extras, n_shards, n_edges_pad):
    """Split one sorted row space into n_shards contiguous padded chunks."""
    n_real = int(mask.sum())
    bounds = [round(n_real * s / n_shards) for s in range(n_shards + 1)]
    chunk = max(b1 - b0 for b0, b1 in zip(bounds, bounds[1:]))
    chunk = -(-max(chunk, 1) // ROW_BLOCK) * ROW_BLOCK  # pad to kernel chunks
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


def partition_batch(batch: dict[str, np.ndarray], n_shards: int) -> dict:
    """Host-side row partitioner: returns a batch whose row-space arrays have
    a leading (n_shards,) axis; all other keys replicated unchanged."""
    n_edges_pad = len(batch["id_c"])
    out = dict(batch)

    ids, mask, extras, splits = _split_rows(
        batch["id3_reduce_ca"], batch["trip_mask"],
        {"id3_expand_ba": batch["id3_expand_ba"]}, n_shards, n_edges_pad,
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
            n_shards, n_edges_pad,
        )
        out["id4_reduce_ca"] = ids
        out["quad_mask"] = mask
        out.update(extras)
        out["quad_row_splits"] = splits
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
            out_specs=(P(), P()), check_vma=False,
        )
        return sharded(variables, batch)

    return jax.jit(apply)


def shard_ep_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a partitioned batch with row spaces sharded over ep."""
    specs = ep_in_specs(batch)
    return {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, specs[k]))
        for k, v in batch.items()
    }
