"""Root-cause probe for test_trajectory_parity_mve (round-5 verdict item 3).

Runs the MVE trajectory twice — with the sorted-VJP gather metadata intact
(the round-4 Pallas/sorted path... on CPU both reduce to XLA, but the SORTED
segment-sum reassociates differently than the scatter-add) and with it
stripped (plain gather + XLA scatter-add VJP, the pre-1d7125e numerics) —
and prints both rel-drift curves vs the cached torch reference trajectory.

Usage: python scripts/mve_bisect.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [repo, os.path.join(repo, "tests")]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from gemnet_pytorch_tpu.data.synthetic import make_dataset  # noqa: E402

path = make_dataset(
    "/tmp/mve_synth.npz", n_molecules=64, min_atoms=4, max_atoms=10, seed=0
)

import test_trajectory_parity as T  # noqa: E402
from gemnet_pytorch_tpu.data import padding  # noqa: E402

_orig_pad = padding.pad_batch


def _stripped_pad(*a, **k):
    b = _orig_pad(*a, **k)
    for key in list(b):
        if key.endswith("_perm") or key.endswith("_sorted"):
            del b[key]
    return b


def run(strip):
    padding.pad_batch = _stripped_pad if strip else _orig_pad
    t = T._run_trajectories(
        path, n_steps=60, eval_interval=10, mve=True,
        threshold_mode="abs", threshold=1e9,
    )
    rel = np.abs(t["ref_losses"] - t["our_losses"]) / (
        np.abs(t["ref_losses"]) + 1e-8
    )
    return t, rel


t_sorted, rel_sorted = run(strip=False)
t_plain, rel_plain = run(strip=True)

env = 2e-4 * (1.0 + 9.0 * np.arange(60) / 60)
print("step  ref_loss      rel_sorted   rel_plain    envelope")
for i in range(60):
    flag = ""
    if rel_sorted[i] > env[i]:
        flag += " SORTED-BREACH"
    if rel_plain[i] > env[i]:
        flag += " PLAIN-BREACH"
    print(f"{i:4d}  {t_sorted['ref_losses'][i]:+.6e}  {rel_sorted[i]:.3e}"
          f"   {rel_plain[i]:.3e}   {env[i]:.3e}{flag}")
print()
print("max rel_sorted:", rel_sorted.max(), "at", rel_sorted.argmax())
print("max rel_plain :", rel_plain.max(), "at", rel_plain.argmax())
print("param_drift sorted/plain:",
      t_sorted["param_drift"], t_plain["param_drift"])
print("ema_drift   sorted/plain:",
      t_sorted["ema_drift"], t_plain["ema_drift"])
print("our-vs-our reassociation spread (sorted vs plain, same framework):")
d = np.abs(t_sorted["our_losses"] - t_plain["our_losses"]) / (
    np.abs(t_sorted["ref_losses"]) + 1e-8
)
for i in range(0, 60, 5):
    print(f"  step {i:3d}: {d[i]:.3e}")
print("  max:", d.max(), "at", d.argmax())
