"""Dataset containers: npz-backed molecule collections and batch assembly.

Equivalent of the reference's DataContainer (gemnet/training/data_container.py:24-113,
156-408): loads N/Z/R/F/E from an npz, and assembles batched graphs on request.
Unlike the reference (which returns ragged torch tensors), batches here are
canonical GraphArrays plus a padded static-shape dict ready for jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .graph import GraphArrays, build_graph
from .padding import PadDims, pad_batch


class DataContainer:
    """npz-backed dataset with on-the-fly padded-batch construction.

    Args:
      path: npz with keys N, Z, R, F, E (reference data_container.py:61,93-113).
      cutoff / int_cutoff: edge / interaction-edge distance cutoffs.
      triplets_only: skip the quadruplet hierarchy (GemNet-T/dT).
    """

    def __init__(
        self,
        path: str,
        cutoff: float,
        int_cutoff: float,
        triplets_only: bool = False,
        addID: bool = False,
    ):
        self.cutoff = cutoff
        self.int_cutoff = int_cutoff
        self.triplets_only = triplets_only
        self.addID = addID
        with np.load(path, allow_pickle=True) as data:
            self.N = data["N"].astype(np.int64)
            self.Z = data["Z"].astype(np.int32)
            self.R = data["R"].astype(np.float32)
            self.F = data["F"].astype(np.float32) if "F" in data else None
            self.E = data["E"].astype(np.float32)
            self.id = data["id"] if addID and "id" in data else None
        assert len(self.E) > 0
        if self.E.ndim == 1:
            self.E = self.E[:, None]
        self.N_cumsum = np.concatenate([[0], np.cumsum(self.N)])
        self.targets = ["E", "F"]

    def __len__(self) -> int:
        return len(self.N)

    def gather_molecules(self, idx: Sequence[int]):
        """Concatenate raw per-molecule arrays for the given molecule ids."""
        idx = np.asarray(idx, dtype=np.int64)
        segs = [np.arange(self.N_cumsum[i], self.N_cumsum[i + 1]) for i in idx]
        atom_idx = (
            np.concatenate(segs) if segs else np.zeros(0, dtype=np.int64)
        )
        N = self.N[idx]
        Z = self.Z[atom_idx]
        R = self.R[atom_idx]
        F = self.F[atom_idx] if self.F is not None else np.zeros((len(atom_idx), 3), np.float32)
        E = self.E[idx]
        return N, Z, R, E, F

    def build(self, idx: Sequence[int]) -> tuple[GraphArrays, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Canonical (unpadded) batch graph for molecule ids."""
        N, Z, R, E, F = self.gather_molecules(idx)
        g = build_graph(
            R, N, self.cutoff, self.int_cutoff, triplets_only=self.triplets_only
        )
        return g, Z, R, E, F

    def get_padded(self, idx: Sequence[int], dims: PadDims) -> dict[str, np.ndarray]:
        """Padded static-shape batch (model inputs + targets + masks)."""
        g, Z, R, E, F = self.build(idx)
        return pad_batch(g, Z, R, dims, E=E, F=F, triplets_only=self.triplets_only)


class Molecule:
    """Single-molecule container for inference/MD (reference ase_calculator.py:23-99).

    Keeps positions mutable; rebuilds the graph on every `get` call, since the
    graph changes as atoms move during MD.
    """

    def __init__(
        self,
        R: np.ndarray,
        Z: np.ndarray,
        cutoff: float,
        int_cutoff: float,
        triplets_only: bool = False,
        dims: Optional[PadDims] = None,
    ):
        assert R.shape == (len(Z), 3)
        self.R = np.asarray(R, dtype=np.float32)
        self.Z = np.asarray(Z, dtype=np.int32)
        self.cutoff = cutoff
        self.int_cutoff = int_cutoff
        self.triplets_only = triplets_only
        self.dims = dims  # lazily grown so MD keeps a stable compiled shape

    def update(self, R: np.ndarray) -> None:
        assert R.shape == self.R.shape
        self.R = np.asarray(R, dtype=np.float32)

    def get(self) -> dict[str, np.ndarray]:
        """Padded model inputs for the current positions."""
        N = np.array([len(self.Z)], dtype=np.int64)
        g = build_graph(
            self.R, N, self.cutoff, self.int_cutoff, triplets_only=self.triplets_only
        )
        if self.dims is None or not self.dims.fits(g, 1, len(self.Z)):
            base = self.dims or PadDims(
                n_mol=1,
                n_atoms=16,
                n_edges=128,
                n_triplets=256,
                kmax3=4,
                n_int_edges=0 if self.triplets_only else 64,
                n_intm=0 if self.triplets_only else 256,
                n_quads=0 if self.triplets_only else 512,
                kmax4=0 if self.triplets_only else 4,
            )
            # 25% headroom so small geometry changes don't retrigger compiles
            from .padding import _scale_graph_dims

            self.dims = base.grow_to(_scale_graph_dims(g, 1.25), 1, len(self.Z))
        return pad_batch(
            g, self.Z, self.R, self.dims, triplets_only=self.triplets_only
        )
