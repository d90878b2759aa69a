#!/usr/bin/env python
"""MD example — script equivalent of the reference's ase_example.ipynb.

Runs a short Langevin simulation of a small molecule driven by a GemNet-T
model (energy-gradient forces), writing an npz trajectory.
"""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from gemnet_pytorch_tpu.config import ModelConfig
from gemnet_pytorch_tpu.data import Molecule
from gemnet_pytorch_tpu.data.synthetic import random_molecule
from gemnet_pytorch_tpu.md import MDSimulator
from gemnet_pytorch_tpu.models import make_model


def main():
    import jax.numpy as jnp

    cfg = ModelConfig(
        num_spherical=7, num_radial=6, num_blocks=2, emb_size_atom=64,
        emb_size_edge=64, emb_size_trip=32, emb_size_quad=16, emb_size_rbf=16,
        emb_size_cbf=16, emb_size_sbf=16, emb_size_bil_quad=16,
        emb_size_bil_trip=32, triplets_only=True, direct_forces=False,
    )
    rng = np.random.default_rng(0)
    Z, R = random_molecule(rng, 10)
    molecule = Molecule(R, Z, cutoff=cfg.cutoff, int_cutoff=cfg.int_cutoff,
                        triplets_only=True)
    model = make_model(cfg)
    batch = {k: jnp.asarray(v) for k, v in molecule.get().items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    sim = MDSimulator(
        molecule, model, variables, dynamics="langevin", max_steps=100,
        time=0.5, temperature=300, interval=10, traj_path="md_sim.traj.npz",
    )
    traj = sim.run()
    print(f"wrote {len(traj)} frames to md_sim.traj.npz")


if __name__ == "__main__":
    main()
