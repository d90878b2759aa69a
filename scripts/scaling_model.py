#!/usr/bin/env python
"""Predicted edges/s scaling-efficiency curves for halo (rung 2b) training.

This environment has ONE physical TPU chip, so pod-scale efficiency cannot be
measured — the model IS the deliverable (round-2 verdict item 5): per-shard
compute time (anchored on the measured/roofline single-chip step) against
per-shard collective bytes over ICI, with and without comm/compute overlap,
for three regimes:

  fixed-small : the bench headline batch (32 molecules) sliced ever thinner
  fixed-large : the 4x32-atom quad-heavy batch sliced ever thinner
  scaled      : graph size grows with chips (32*S molecules) — the motivating
                workload: each shard keeps ~one bench-batch of rows

Model
-----
T_comp(S) = T1 * (f0 + (1 - f0) * local_rows(S) / rows(1))
    T1  = single-chip train-step time (measured; bench.py median, or the
          roofline SOL for a lower bound), f0 = non-sharded fraction.
          f0 is MEASURED since round 5 (0.006 fp32 / 0.009 bf16): per-op
          trace attribution classed by shape — row-space (halo-shardable:
          edge/trip/intm/quad and their staged views) vs replicated
          (optimizer over the 2.16M flat params, atom/mol spaces). The
          round-2..4 default 0.10 was an unmeasured guess, 15x pessimistic:
          the basis/rbf-MLP preamble is EDGE-space work that halo already
          shards with the edges.
T_comm(S) = bytes_per_shard(S) / BW_ici
    bytes/shard/step = 4*nb*(S*h_e*ee + S*h_i*eq)*4B   [halo all_to_alls]
                     + 36*atoms_pad*emb_atom*4B        [atom-space psums]
                     + fixed 6.1 MB                    [param/E/F partials]
    CALIBRATED against the jaxpr collective census at S=8 on the small batch
    (artifacts_r02_comm.md: 13.3 + 6.2 + 6.1 = 25.6 MB/shard measured; this
    formula gives 25.5). Halo sizes h_e/h_i come from REAL partitions built
    here (parallel/halo.build_halo_partition).
T_step = max(T_comp, T_comm)   [overlap: the two-stage issue-before-consume
                                schedule, models/interaction.py]
       or T_comp + T_comm      [no overlap, worst case]
Efficiency(S) = T1 / (S * T_step(S))   [fixed batch]
              = T1 / T_step(S)         [scaled: per-chip throughput ratio]

BW_ici default 2.0e11 B/s (v5e: 1.6 Tbps/link; a2a on the 2D torus can use
several links, so single-link is conservative — pass --ici-gbps to sweep).

Run:  python scripts/scaling_model.py [--t1-small-ms X --t1-large-ms Y]
Emits a markdown table (paste into PARALLEL.md / artifacts) and flags the S
where each regime drops below the 80% BASELINE.md target.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

FIXED_MB = 6.1  # param/energy/force partial psums (census, S-independent)
ATOM_PSUM_CALLS = 36  # fwd+bwd atom-space psums, flagship nb=4 (census)


def batch_graphs(kind: str, cfg, scale: int = 1):
    from gemnet_pytorch_tpu.data.graph import build_graph
    from gemnet_pytorch_tpu.data.synthetic import random_molecule

    rng = np.random.default_rng(0)
    if kind == "large":
        mols = [random_molecule(rng, 32) for _ in range(4 * scale)]
    else:
        mols = [random_molecule(rng, int(rng.integers(8, 13)))
                for _ in range(32 * scale)]
    N = np.array([len(z) for z, _ in mols])
    Z = np.concatenate([z for z, _ in mols])
    R = np.concatenate([r for _, r in mols])
    g = build_graph(R, N, cfg.cutoff, cfg.int_cutoff, triplets_only=False)
    return g, Z, R


def comm_bytes_per_shard(part, S, cfg, atoms_pad):
    """Calibrated per-shard WIRE bytes per train step (see docstring).

    Census payloads are converted to wire traffic: an all_to_all of payload P
    sends (S-1)/S * P per shard; a ring all-reduce (psum) sends
    2*(S-1)/S * P. Both vanish at S=1."""
    nb, ee, eq = cfg.num_blocks, cfg.emb_size_edge, cfg.emb_size_quad
    _, h_e, _, _, _, h_i, _ = part["halo_meta"]
    a2a = (S - 1) / S
    ring = 2 * (S - 1) / S
    halo = 4 * nb * (S * h_e * ee + S * h_i * eq) * 4 * a2a
    atom = ATOM_PSUM_CALLS * atoms_pad * cfg.emb_size_atom * 4 * ring
    return halo + atom + FIXED_MB * 1e6 * ring


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t1-small-ms", type=float, default=None,
                    help="measured single-chip train-step ms, small batch "
                    "(bench.py median); default: BENCH_r03/BENCH_r02 value")
    ap.add_argument("--t1-large-ms", type=float, default=None,
                    help="measured single-chip step ms, large batch")
    ap.add_argument("--ici-gbps", type=float, default=1600.0,
                    help="ICI bandwidth per LINK, Gbit/s (v5e link: 1600)")
    ap.add_argument("--links", type=float, default=1.0,
                    help="usable ICI links per chip (v5e 2D torus has 4; a "
                    "bidirectional ring a2a uses 2; default 1 = conservative)")
    ap.add_argument("--f0", type=float, default=0.008,
                    help="non-sharded compute fraction. Default = MEASURED "
                    "(round 5): op-level trace attribution of the bench "
                    "step classed by row-space vs replicated shapes gives "
                    "0.006 (fp32) / 0.009 (bf16) — optimizer + atom-space "
                    "work; the basis preamble is edge-space and shards")
    ap.add_argument("--max-s", type=int, default=64)
    args = ap.parse_args()

    import json
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gemnet_pytorch_tpu.config import ModelConfig, load_yaml_config
    from gemnet_pytorch_tpu.parallel.halo import build_halo_partition

    cfg = ModelConfig.from_dict(load_yaml_config("config.yaml"))
    bw = args.ici_gbps * 1e9 / 8.0 * args.links

    t1 = {"small": args.t1_small_ms, "large": args.t1_large_ms}
    for rec in ("BENCH_r05.json", "BENCH_r04.json", "BENCH_r03.json",
                "BENCH_r02.json"):
        if os.path.exists(rec) and (t1["small"] is None or t1["large"] is None):
            j = json.load(open(rec))
            # agg/s -> ms via the recorded real row counts of the bench batch
            if t1["small"] is None and "small_n_real" in j:
                t1["small"] = j["small_n_real"] / j["value"] * 1e3
            if t1["large"] is None and {"large_n_real", "large_agg_per_s"} <= set(j):
                t1["large"] = j["large_n_real"] / j["large_agg_per_s"] * 1e3
            break
    # fall back to the round-2 healthy-state anchors (CLAUDE.md), flagged
    if t1["small"] is None:
        t1["small"] = 0.31
        print("WARNING: --t1-small-ms not given and no n_real in BENCH json; "
              "using the round-2 healthy anchor 0.31 ms", file=sys.stderr)
    if t1["large"] is None:
        t1["large"] = 1.0
        print("WARNING: using placeholder 1.0 ms for the large batch",
              file=sys.stderr)

    shard_counts = [s for s in (1, 2, 4, 8, 16, 32, 64) if s <= args.max_s]
    print(f"# Halo scaling-efficiency model (T1 small={t1['small']:.3f} ms, "
          f"large={t1['large']:.3f} ms, f0={args.f0}, "
          f"ICI={args.ici_gbps:.0f} Gbps x {args.links:g} links)\n")

    for regime in ("fixed-small", "fixed-large", "scaled"):
        kind = "large" if regime == "fixed-large" else "small"
        T1 = t1[kind]
        print(f"## {regime} (T1 = {T1:.3f} ms)\n")
        print("| S | rows/shard | halo h_e/h_i | comm MB/shard | T_comp ms | "
              "T_comm ms | eff(overlap) | eff(no-overlap) |")
        print("|---|---|---|---|---|---|---|---|")
        if regime != "scaled":
            g, Z, R = batch_graphs(kind, cfg)
            rows1 = g.n_triplets + g.n_quads
        break80 = {}
        for S in shard_counts:
            if regime == "scaled":
                g, Z, R = batch_graphs("small", cfg, scale=S)
                rows1 = (g.n_triplets + g.n_quads) / S  # per-shard target
            part = build_halo_partition(g, Z, R, S, triplets_only=False)
            E_loc, h_e, T_loc, _, _, h_i, Q_loc = part["halo_meta"]
            trip_rows = part["trip_mask"].sum(axis=1)
            quad_rows = part["quad_mask"].sum(axis=1)
            local_rows = float((trip_rows + quad_rows).max())
            atoms_pad = part["atom_mask"].shape[-1]
            cb = comm_bytes_per_shard(part, S, cfg, atoms_pad)
            if regime == "scaled":
                shrink = local_rows / rows1  # ~1: constant per-shard work
                t_comp = T1 * (args.f0 + (1 - args.f0) * shrink)
            else:
                t_comp = T1 * (args.f0 + (1 - args.f0) * local_rows /
                               (g.n_triplets + g.n_quads))
            t_comm = cb / bw * 1e3
            t_ov = max(t_comp, t_comm)
            t_no = t_comp + t_comm
            if regime == "scaled":
                eff_ov, eff_no = T1 / t_ov, T1 / t_no
            else:
                eff_ov, eff_no = T1 / (S * t_ov), T1 / (S * t_no)
            for tag, e in (("overlap", eff_ov), ("no-overlap", eff_no)):
                if e < 0.80 and tag not in break80:
                    break80[tag] = S
            print(f"| {S} | {int(local_rows):,} | {h_e}/{h_i} | "
                  f"{cb/1e6:.2f} | {t_comp:.3f} | {t_comm:.3f} | "
                  f"{eff_ov*100:.0f}% | {eff_no*100:.0f}% |")
        msg = ", ".join(f"{k}: S={v}" for k, v in break80.items()) or "none ≤ max S"
        print(f"\n80% breaks at — {msg}\n")


if __name__ == "__main__":
    main()
