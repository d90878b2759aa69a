#!/usr/bin/env python
"""Inference example — script equivalent of the reference's predict.ipynb.

Builds a single molecule, loads the released GemNet-Q configuration +
scaling factors, and predicts energy/forces with the jitted model
(autograd-force path, as the released checkpoints use direct_forces=False).
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gemnet_pytorch_tpu.data import Molecule
from gemnet_pytorch_tpu.models import energy_and_forces
from gemnet_pytorch_tpu.pretrained import load_pretrained

# benzonitrile-like C7NH5 geometry (same molecule as the reference demo)
Z = np.array([6, 6, 6, 6, 6, 6, 6, 7, 1, 1, 1, 1, 1])
R = np.array([
    [-1.2131, -0.6884, 0.0], [-1.2028, 0.7064, 0.0001],
    [-0.0103, 1.4246, 0.0001], [1.1939, 0.7196, 0.0], [1.1935, -0.6943, -0.0001],
    [0.0025, -1.4063, -0.0001], [2.4404, -1.4306, -0.0001], [3.4290, -2.0031, 0.0],
    [-2.1577, -1.2205, 0.0], [-2.1393, 1.2535, 0.0001], [-0.0184, 2.5085, 0.0002],
    [2.1301, 1.2735, 0.0], [0.0129, -2.4894, -0.0002],
], dtype=np.float32)


def main():
    from gemnet_pytorch_tpu.md import GemNetCalculator

    kwargs_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/pretrained/GemNet-Q"
    molecule = Molecule(R, Z, cutoff=5.0, int_cutoff=10.0, triplets_only=False)
    model, variables = load_pretrained(kwargs_dir, molecule.get())

    calc = GemNetCalculator(molecule, model, variables)
    energy, forces = calc.calculate()
    print("Energy [eV]:", energy)
    print("Forces [eV/A]:\n", forces)


if __name__ == "__main__":
    main()
