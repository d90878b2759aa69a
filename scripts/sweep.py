#!/usr/bin/env python
"""Variant-grid sweep driver — stands in for the reference's Sacred/SEML grid
(reference config_seml.yaml:80-92: triplets_only x direct_forces), without the
Sacred/MongoDB machinery: runs each configuration sequentially via train.main
with config overrides and collects the best metrics into one JSON report.

Usage: python scripts/sweep.py [--num-steps N] [--out sweep_results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRID = [
    {"triplets_only": True, "direct_forces": True, "comment": "GemNet-dT"},
    {"triplets_only": True, "direct_forces": False, "comment": "GemNet-T"},
    {"triplets_only": False, "direct_forces": True, "comment": "GemNet-dQ"},
    {"triplets_only": False, "direct_forces": False, "comment": "GemNet-Q"},
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config.yaml")
    p.add_argument("--num-steps", type=int, default=200)
    p.add_argument("--evaluation-interval", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--logdir", default="logs/sweep")
    p.add_argument("--out", default="sweep_results.json")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import train as train_mod

    results = {}
    for overrides in GRID:
        name = overrides["comment"]
        print(f"=== {name} ===", flush=True)
        argv = [
            "train.py", "--config", args.config,
            "--num-steps", str(args.num_steps),
            "--evaluation-interval", str(args.evaluation_interval),
            "--save-interval", str(10 * args.num_steps),
            "--batch-size", str(args.batch_size),
            "--logdir", os.path.join(args.logdir, name),
        ]
        if args.platform:
            argv += ["--platform", args.platform]
        old_argv, sys.argv = sys.argv, argv
        # config overrides travel via a patched loader
        orig_loader = train_mod.main.__globals__.get("_sweep_overrides")
        os.environ["GEMNET_SWEEP_OVERRIDES"] = json.dumps(
            {k: v for k, v in overrides.items()}
        )
        try:
            results[name] = train_mod.main()
        finally:
            sys.argv = old_argv
            os.environ.pop("GEMNET_SWEEP_OVERRIDES", None)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
