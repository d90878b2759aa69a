"""Intrinsic-sensitivity probe for test_trajectory_parity_mve.

Runs OUR MVE trajectory twice — identical except the initial parameters of
the second run are multiplied by (1 + 1 ULP) — and prints the induced
rel-loss spread per step next to the ref-vs-ours rel and the test envelope.
If the 1-ULP self-spread at the breaching steps matches or exceeds the
ref-vs-ours drift, the envelope is tighter than the trajectory's own chaos
bound and must be re-derived from this measured statistic (no implementation
could meet it reliably).

Usage: python scripts/mve_sensitivity.py
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
import gemnet_pytorch_tpu.compat as compat  # noqa: E402

_orig_import = compat.import_reference_state_dict
ULP = np.float32(1.0) + np.float32(2.0**-23)


def _perturbed_import(sd, variables):
    out = _orig_import(sd, variables)
    out["params"] = jax.tree_util.tree_map(
        lambda x: (x * ULP).astype(x.dtype), out["params"]
    )
    return out


def run(perturb):
    compat.import_reference_state_dict = (
        _perturbed_import if perturb else _orig_import
    )
    return T._run_trajectories(
        path, n_steps=60, eval_interval=10, mve=True,
        threshold_mode="abs", threshold=1e9,
    )


base = run(False)
pert = run(True)

ref = base["ref_losses"]
rel_ref = np.abs(ref - base["our_losses"]) / (np.abs(ref) + 1e-8)
rel_ulp = np.abs(base["our_losses"] - pert["our_losses"]) / (
    np.abs(ref) + 1e-8
)
env = 2e-4 * (1.0 + 9.0 * np.arange(60) / 60)
print("step  ref_loss      rel(ref,ours)  rel(1ulp self)  envelope")
for i in range(60):
    flags = []
    if rel_ref[i] > env[i]:
        flags.append("REF-BREACH")
    if rel_ulp[i] > env[i]:
        flags.append("ULP-BREACH")
    print(f"{i:4d}  {ref[i]:+.6e}  {rel_ref[i]:.3e}      {rel_ulp[i]:.3e}"
          f"     {env[i]:.3e}  {' '.join(flags)}")
print()
print(f"max rel(ref,ours):  {rel_ref.max():.3e} at {rel_ref.argmax()}")
print(f"max rel(1ulp self): {rel_ulp.max():.3e} at {rel_ulp.argmax()}")
print(f"ratio at step 57:   ulp/ref = {rel_ulp[57]/max(rel_ref[57],1e-12):.2f}")
print(f"param_drift base/pert: {base['param_drift']:.3e} "
      f"{pert['param_drift']:.3e}")
