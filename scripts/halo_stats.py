#!/usr/bin/env python
"""Rung 2b (halo) partition statistics: per-shard memory/row shrink and the
per-step halo all-to-all traffic, measured from real partitions.

For the bench workloads (small COLL-like batch + the large-graph point) at
1/2/4/8 shards, reports per shard:
  - local edge/triplet/quad capacities vs the single-device padded dims
    (the memory + row-FLOP shrink edge partitioning buys),
  - halo sizes h_e/h_i and the resulting bytes moved per interaction block
    (edge-space all_to_all: S*h_e rows x emb_size_edge; intm-space (Q only):
    S*h_i rows x emb_size_quad) and per train step (x num_blocks, x2 for
    the backward's mirrored exchange),
  - row-balance quality (max/mean triplet+quad rows per shard).

VERDICT r1 item 1 "Done" evidence (measured comm-bytes). Run on CPU; the
numbers are host-side partition facts, independent of the execution backend.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np


def batch_graphs(kind: str, cfg):
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.synthetic import random_molecule

    rng = np.random.default_rng(0)
    if kind == "bench":
        mols = [random_molecule(rng, int(rng.integers(8, 13))) for _ in range(32)]
    else:  # large
        mols = [random_molecule(rng, 32) for _ in range(4)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=False)
    return g, Z, R


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from gemnet_pytorch_tpu.config import ModelConfig, load_yaml_config
    from gemnet_pytorch_tpu.parallel.halo import build_halo_partition

    cfg = ModelConfig.from_dict(load_yaml_config("config.yaml"))
    nb, ee, eq = cfg.num_blocks, cfg.emb_size_edge, cfg.emb_size_quad

    for kind in ("bench", "large"):
        g, Z, R = batch_graphs(kind, cfg)
        print(f"== {kind}: {g.n_edges} edges, {g.n_triplets} trip, "
              f"{g.n_quads} quads, {len(Z)} atoms")
        for S in (1, 2, 4, 8, 16, 32, 64):
            part = build_halo_partition(g, Z, R, S, triplets_only=False)
            E_loc, h_e, T_loc, I_ca, I_db, h_i, Q_loc = part["halo_meta"]
            trip_rows = part["trip_mask"].sum(axis=1)
            quad_rows = part["quad_mask"].sum(axis=1)
            rows = trip_rows + quad_rows
            balance = rows.max() / max(rows.mean(), 1)
            # per-shard per-block exchange: edge halo (T+Q expand) + intm halo
            # (Q expand); x2 per block for the transposed exchange in backward
            edge_bytes = S * h_e * ee * 4
            intm_bytes = S * h_i * eq * 4
            step_bytes = 2 * nb * (edge_bytes + intm_bytes)
            print(
                f"  S={S}: E_loc={E_loc:6d} T_loc={T_loc:7d} Q_loc={Q_loc:7d} "
                f"(shrink x{g.n_quads / max(Q_loc, 1):.2f})  "
                f"h_e={h_e:5d} h_i={h_i:5d}  "
                f"halo/blk={edge_bytes + intm_bytes:,}B  "
                f"train-step comm/shard={step_bytes / 1e6:.2f}MB  "
                f"balance(max/mean rows)={balance:.3f}"
            )
        print()


if __name__ == "__main__":
    main()
