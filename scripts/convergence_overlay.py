#!/usr/bin/env python
"""Produce the convergence-scale torch-vs-jax overlay artifact (CPU).

Runs the reference trainer and this framework for N identical steps on the
same synthetic dataset (reusing the tests' cached-reference helper) and
writes artifacts_r04_convergence.md with the overlaid train/val curves and
outcome deltas. Companion of tests/test_convergence_overlay.py (same data,
same tolerances); VERDICT r3 item 6.

Run: python scripts/convergence_overlay.py [--steps 2000] [--eval 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def sparkline(xs, width=60):
    blocks = " .:-=+*#%@"
    xs = np.asarray(xs, float)
    if len(xs) > width:
        idx = np.linspace(0, len(xs) - 1, width).astype(int)
        xs = xs[idx]
    lo, hi = np.nanmin(xs), np.nanmax(xs)
    rng = hi - lo or 1.0
    return "".join(blocks[int((v - lo) / rng * (len(blocks) - 1))] for v in xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--eval", type=int, default=100)
    ap.add_argument("--out", default="artifacts_r04_convergence.md")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gemnet_pytorch_tpu.data.synthetic import make_dataset

    npz = "/tmp/convergence_ds.npz"
    if not os.path.exists(npz):
        make_dataset(npz, n_molecules=64, min_atoms=4, max_atoms=10, seed=0)

    from test_trajectory_parity import _run_trajectories

    t0 = time.time()
    t = _run_trajectories(npz, n_steps=args.steps, eval_interval=args.eval,
                          loss="rmse")
    wall = time.time() - t0

    w = 25
    k = np.ones(w) / w
    ref_s = np.convolve(t["ref_losses"], k, mode="valid")
    our_s = np.convolve(t["our_losses"], k, mode="valid")
    rel = np.abs(ref_s - our_s) / (np.abs(ref_s) + 1e-8)
    vrel = np.abs(t["ref_vals"] - t["our_vals"]) / (np.abs(t["ref_vals"]) + 1e-8)

    lines = [
        "# Convergence-scale parity overlay (torch reference vs this framework)",
        "",
        f"{args.steps} identical steps (same weights-init, same batch cycle, "
        f"same LR schedule/plateau machinery), eval every {args.eval} steps, "
        f"synthetic dataset, CPU, wall {wall/60:.1f} min "
        "(reference side disk-cached after the first run).",
        "",
        "| metric | reference | ours | rel gap |",
        "|---|---|---|---|",
        f"| first train loss | {t['ref_losses'][0]:.6f} | "
        f"{t['our_losses'][0]:.6f} | "
        f"{abs(t['ref_losses'][0]-t['our_losses'][0])/abs(t['ref_losses'][0]):.2e} |",
        f"| final train loss (25-step smooth) | {ref_s[-1]:.6f} | "
        f"{our_s[-1]:.6f} | {rel[-1]:.2e} |",
        f"| final EMA-val loss | {t['ref_vals'][-1]:.6f} | "
        f"{t['our_vals'][-1]:.6f} | {vrel[-1]:.2e} |",
        f"| plateau LR reduces | {t['ref_reduces']} | {t['our_reduces']} | "
        f"{'identical' if t['ref_reduces']==t['our_reduces'] else 'DIFFER'} |",
        f"| final lr scale | {t['ref_lr_ratio']:.6g} | "
        f"{t['our_lr_scale']:.6g} | — |",
        f"| final param drift (max rel) | — | — | {t['param_drift']:.2e} |",
        f"| final EMA drift (max rel) | — | — | {t['ema_drift']:.2e} |",
        "",
        f"Smoothed-loss rel gap over the horizon: median {np.median(rel):.2e},"
        f" p95 {np.percentile(rel, 95):.2e}, max {rel.max():.2e}.",
        "",
        "Train-loss curves (25-step smoothed, log-ish shape):",
        "```",
        f"ref  {sparkline(ref_s)}",
        f"ours {sparkline(our_s)}",
        f"gap  {sparkline(rel)}   (rel, max {rel.max():.1e})",
        "```",
        "",
        "EMA-val curves:",
        "```",
        f"ref  {sparkline(t['ref_vals'])}",
        f"ours {sparkline(t['our_vals'])}",
        "```",
        "",
        "Assertion-backed version: tests/test_convergence_overlay.py "
        "(GEMNET_CONVERGENCE=1). Reference loop: "
        "/root/reference/train_seml.py:308-387.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwritten to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
