"""Compatibility re-export matching the reference's root-level module layout
(reference ase_calculator.py): Molecule, calculator, and MD simulator."""

from gemnet_pytorch_tpu.data.containers import Molecule  # noqa: F401
from gemnet_pytorch_tpu.md import (  # noqa: F401
    GemNetCalculator,
    MDSimulator,
    make_ase_calculator,
)
