"""Molecular-dynamics integration driven by GemNet predictions.

Counterpart of the reference's ase_calculator.py (GNNCalculator + MDSimulator,
reference ase_calculator.py:102-271): a calculator that rebuilds the graph
every step and predicts energy/forces with the jitted model, plus MD
integrators. ASE is an *optional* dependency here — when installed, the
`make_ase_calculator` adapter exposes the standard ase Calculator interface;
without it, the built-in VelocityVerlet/Langevin integrators (ASE-equivalent
units/semantics) drive simulations natively so MD works hermetically.

TPU note: `Molecule.get` keeps a stable padded shape across steps (25%
headroom, data/containers.py), so the jitted predict function compiles once
and each MD step is one device call.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data.containers import Molecule
from .models.gemnet import GemNet, energy_and_forces

# ASE units: eV, Angstrom, amu; kB in eV/K; fs = 0.09822694788... sqrt(amu A^2/eV)
KB_EV_PER_K = 8.617330337217213e-05
FS = 0.09822694788464063  # 1 femtosecond in sqrt(amu)*A/sqrt(eV) units

# atomic masses (amu), Z = 1..20 (ase.data.atomic_masses values)
ATOMIC_MASSES = np.array([
    0.0, 1.008, 4.002602, 6.94, 9.0121831, 10.81, 12.011, 14.007, 15.999,
    18.998403163, 20.1797, 22.98976928, 24.305, 26.9815385, 28.085,
    30.973761998, 32.06, 35.45, 39.948, 39.0983, 40.078,
])

# EPBE0 atomic reference energies in eV from QM7-X (reference
# ase_calculator.py:133-141)
ATOM_ENERGIES = {
    1: -13.641404161,
    6: -1027.592489146,
    7: -1484.274819088,
    8: -2039.734879322,
    16: -10828.707468187,
    17: -12516.444619523,
}


class GemNetCalculator:
    """Energy/force calculator: graph rebuild per step + jitted predict
    (reference GNNCalculator, ase_calculator.py:102-170)."""

    def __init__(
        self,
        molecule: Molecule,
        model: GemNet,
        variables: dict,
        add_atom_energies: bool = False,
    ):
        self.molecule = molecule
        self.model = model
        self.variables = variables
        self.add_atom_energies = add_atom_energies
        self._jitted: Optional[Callable] = None
        self._shape_key = None

    def _predict_fn(self):
        model = self.model

        @jax.jit
        def predict(variables, batch):
            E, F, _ = energy_and_forces(model, variables, batch)
            return E, F

        return predict

    def calculate(self, R: Optional[np.ndarray] = None) -> tuple[float, np.ndarray]:
        """Returns (energy eV, forces (nAtoms,3) eV/A) for positions R."""
        if R is not None:
            self.molecule.update(np.asarray(R, np.float32))
        batch_np = self.molecule.get()
        shape_key = tuple(sorted((k, v.shape) for k, v in batch_np.items()))
        if self._jitted is None or shape_key != self._shape_key:
            self._jitted = self._predict_fn()  # new shapes -> fresh compile
            self._shape_key = shape_key
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        E, F = self._jitted(self.variables, batch)
        n = len(self.molecule.Z)
        energy = float(np.asarray(E)[0, 0])
        forces = np.asarray(F)[:n, 0, :]
        if self.add_atom_energies:
            energy += float(sum(ATOM_ENERGIES[int(z)] for z in self.molecule.Z))
        return energy, forces


def maxwell_boltzmann_velocities(
    Z: np.ndarray, temperature_K: float, rng: np.random.Generator
) -> np.ndarray:
    """Velocities from the Maxwell-Boltzmann distribution, with the
    center-of-mass motion removed (reference ase_calculator.py:225-233)."""
    masses = ATOMIC_MASSES[Z]
    sigma = np.sqrt(KB_EV_PER_K * temperature_K / masses)[:, None]
    v = rng.normal(size=(len(Z), 3)) * sigma
    p = masses[:, None] * v
    v -= p.sum(axis=0) / masses.sum()  # stationary center of mass
    return v


@dataclass
class Trajectory:
    """In-memory/npz trajectory store (stands in for ase.io.Trajectory)."""

    path: Optional[str] = None
    frames_R: list = field(default_factory=list)
    frames_E: list = field(default_factory=list)
    frames_v: list = field(default_factory=list)

    def write(self, R, E, v):
        self.frames_R.append(np.array(R))
        self.frames_E.append(float(E))
        self.frames_v.append(np.array(v))

    def close(self):
        if self.path:
            np.savez(
                self.path,
                R=np.stack(self.frames_R) if self.frames_R else np.zeros((0, 0, 3)),
                E=np.array(self.frames_E),
                v=np.stack(self.frames_v) if self.frames_v else np.zeros((0, 0, 3)),
            )

    def __len__(self):
        return len(self.frames_R)


class MDSimulator:
    """MD loop: Velocity Verlet or Langevin (reference MDSimulator,
    ase_calculator.py:173-271), implemented natively; uses ASE units."""

    def __init__(
        self,
        molecule: Molecule,
        model: GemNet,
        variables: dict,
        dynamics: str = "langevin",
        max_steps: int = 100,
        time: float = 0.5,  # fs
        temperature: float = 300.0,  # K
        langevin_friction: float = 0.002,
        interval: int = 10,
        traj_path: Optional[str] = "md_sim.traj.npz",
        vel: Optional[np.ndarray] = None,
        seed: int = 0,
        logfile: Optional[str] = "-",
    ):
        self.calc = GemNetCalculator(molecule, model, variables)
        self.molecule = molecule
        self.max_steps = max_steps
        self.dt = time * FS
        self.temperature = temperature
        self.friction = langevin_friction
        self.interval = interval
        self.dynamics = dynamics.lower()
        if self.dynamics not in ("verlet", "langevin"):
            raise ValueError(f"unknown MD integrator {dynamics}")
        self.rng = np.random.default_rng(seed)
        self.masses = ATOMIC_MASSES[molecule.Z][:, None]
        self.v = (
            np.asarray(vel, np.float64)
            if vel is not None
            else maxwell_boltzmann_velocities(molecule.Z, temperature, self.rng)
        )
        self.traj = Trajectory(traj_path)
        self.logfile = logfile
        logging.info("Selected MD integrator: %s", self.dynamics)

    def _log(self, step, E_pot):
        E_kin = 0.5 * float((self.masses * self.v**2).sum())
        T = 2 * E_kin / (3 * len(self.molecule.Z) * KB_EV_PER_K)
        msg = (
            f"step {step}: Epot={E_pot:.6f} eV Ekin={E_kin:.6f} eV "
            f"Etot={E_pot + E_kin:.6f} eV T={T:.1f} K"
        )
        if self.logfile == "-":
            logging.info(msg)
        elif self.logfile:
            with open(self.logfile, "a") as f:
                f.write(msg + "\n")

    def run(self) -> Trajectory:
        R = np.asarray(self.molecule.R, np.float64)
        E, F = self.calc.calculate(R)
        for step in range(self.max_steps):
            if self.dynamics == "verlet":
                # velocity Verlet (ase.md.verlet semantics)
                self.v += 0.5 * self.dt * F / self.masses
                R = R + self.dt * self.v
                E, F = self.calc.calculate(R)
                self.v += 0.5 * self.dt * F / self.masses
            else:
                # Langevin thermostat (ase.md.langevin third-order scheme,
                # simplified BAOAB-like splitting)
                fr = self.friction
                sigma = np.sqrt(2 * self.temperature * KB_EV_PER_K * fr / self.masses)
                xi = self.rng.normal(size=R.shape)
                self.v += (
                    0.5 * self.dt * (F / self.masses - fr * self.v)
                    + 0.5 * np.sqrt(self.dt) * sigma * xi
                )
                R = R + self.dt * self.v
                E, F = self.calc.calculate(R)
                xi = self.rng.normal(size=R.shape)
                self.v += (
                    0.5 * self.dt * (F / self.masses - fr * self.v)
                    + 0.5 * np.sqrt(self.dt) * sigma * xi
                )
            if step % self.interval == 0:
                self.traj.write(R, E, self.v)
                self._log(step, E)
        self.traj.close()
        return self.traj


def make_ase_calculator(molecule: Molecule, model: GemNet, variables: dict,
                        add_atom_energies: bool = False, **kwargs):
    """ASE adapter (only if ase is installed): returns an ase Calculator whose
    calculate() defers to GemNetCalculator (reference ase_calculator.py:102-170)."""
    try:
        from ase.calculators.calculator import Calculator, all_changes
    except ImportError as e:
        raise ImportError(
            "ase is not installed; use GemNetCalculator / MDSimulator directly"
        ) from e

    inner = GemNetCalculator(molecule, model, variables, add_atom_energies)

    class _GNNCalculator(Calculator):
        implemented_properties = ["energy", "forces"]

        def calculate(self, atoms=None, properties=("energy", "forces"),
                      system_changes=all_changes):
            super().calculate(atoms, properties, system_changes)
            energy, forces = inner.calculate(atoms.positions)
            self.results["energy"] = energy
            self.results["forces"] = forces

    return _GNNCalculator(**kwargs)
