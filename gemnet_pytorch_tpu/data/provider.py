"""Train/val/test splits and infinite padded-batch iterators.

Equivalent of the reference DataProvider (gemnet/training/data_provider.py:25-174):
random or manual splits, save_split, shuffled infinite generators. Batching
happens in the container (whole index list at once), and every batch is padded
to one static `PadDims` so the jitted train step compiles once.
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

import numpy as np

from .containers import DataContainer
from .padding import PadDims, estimate_pad_dims


class DataProvider:
    def __init__(
        self,
        data_container: DataContainer,
        ntrain: int,
        nval: int,
        batch_size: int = 1,
        seed: Optional[int] = None,
        random_split: bool = False,
        shuffle: bool = True,
        sample_with_replacement: bool = False,
        split: Union[None, str, dict] = None,
        pad_dims: Optional[PadDims] = None,
        pad_sample_batches: int = 16,
    ):
        self.data_container = data_container
        self._ndata = len(data_container)
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.random_split = random_split
        self.sample_with_replacement = sample_with_replacement
        self._random_state = np.random.RandomState(seed=seed)

        if split is None:
            self.nsamples, self.idx = self._random_split_data(ntrain, nval)
        else:
            self.nsamples, self.idx = self._manual_split_data(split)

        self.pad_dims = pad_dims or self._estimate_dims(pad_sample_batches)

    # -- splits (reference data_provider.py:82-126) --
    def _manual_split_data(self, split):
        if isinstance(split, str):
            assert split.endswith(".npz")
            split = np.load(split)
        keys = ["train", "val", "test"]
        for key in keys:
            assert key in split, f"{key} missing from split"
        idx = {key: np.asarray(split[key]) for key in keys}
        return {key: len(idx[key]) for key in keys}, idx

    def _random_split_data(self, ntrain, nval):
        nsamples = {"train": ntrain, "val": nval, "test": self._ndata - ntrain - nval}
        all_idx = np.arange(self._ndata)
        if self.random_split:
            all_idx = self._random_state.permutation(all_idx)
        if self.sample_with_replacement:
            all_idx = self._random_state.choice(all_idx, self._ndata, replace=True)
        idx = {
            "train": all_idx[0:ntrain],
            "val": all_idx[ntrain : ntrain + nval],
            "test": all_idx[ntrain + nval :],
        }
        return nsamples, idx

    def save_split(self, path: str) -> None:
        assert path.endswith(".npz")
        np.savez(path, **self.idx)

    # -- static-shape selection --
    def _estimate_dims(self, n_batches: int) -> PadDims:
        """Scan sample batches to size the static padded shapes."""
        rng = np.random.RandomState(0)
        graphs, natoms = [], []
        pool = np.arange(self._ndata)
        for _ in range(n_batches):
            sel = rng.choice(pool, size=min(self.batch_size, self._ndata), replace=False)
            g, Z, R, E, F = self.data_container.build(sel)
            graphs.append(g)
            natoms.append(len(Z))
        return estimate_pad_dims(
            graphs,
            n_mol=self.batch_size,
            n_atoms_list=natoms,
            triplets_only=self.data_container.triplets_only,
            headroom=1.25,
        )

    # -- iteration (reference data_provider.py:137-174) --
    def _build_padded(self, sel: np.ndarray) -> dict[str, np.ndarray]:
        from .padding import _scale_graph_dims, pad_batch

        g, Z, R, E, F = self.data_container.build(sel)
        n_mol = len(sel)
        if not self.pad_dims.fits(g, n_mol, len(Z)):
            # rare outlier batch: grow dims (forces one recompile)
            self.pad_dims = self.pad_dims.grow_to(
                _scale_graph_dims(g, 1.25), n_mol, int(len(Z) * 1.25)
            )
        return pad_batch(
            g, Z, R, self.pad_dims, E=E, F=F,
            triplets_only=self.data_container.triplets_only,
        )

    def _selections(self, split: str, batch_size: int):
        shuffle = self.shuffle if split == "train" else False
        indices = self.idx[split]
        rng = np.random.RandomState(self.seed)
        while True:
            order = rng.permutation(indices) if shuffle else indices
            for i in range(0, len(order), batch_size):
                sel = order[i : i + batch_size]
                if len(sel):
                    yield sel

    def get_dataset(
        self,
        split: str,
        batch_size: Optional[int] = None,
        prefetch_workers: int = 2,
        prefetch_depth: int = 4,
        transform=None,
        raw_transform=None,
    ) -> Iterator[dict[str, np.ndarray]]:
        """Infinite padded-batch iterator. With prefetch_workers > 0, batches
        are built by background threads ahead of consumption (the native graph
        builder and numpy padding release the GIL), overlapping host-side
        graph construction with device steps — the reference's
        DataLoader-worker role (data_provider.py:164), absent there by
        default (num_workers=0).

        `transform` maps the PADDED batch dict; `raw_transform(g, Z, R, E, F)`
        instead replaces the padding step entirely and receives the raw
        batched graph — used by partitioners that build their own device
        layout (e.g. parallel/halo.build_halo_partition)."""
        assert split in self.idx
        batch_size = batch_size or self.batch_size
        sels = self._selections(split, batch_size)
        assert transform is None or raw_transform is None

        def build(sel):
            if raw_transform is not None:
                return raw_transform(*self.data_container.build(sel))
            b = self._build_padded(sel)
            return transform(b) if transform is not None else b

        if prefetch_workers <= 0:
            def generator():
                for sel in sels:
                    yield build(sel)

            return generator()

        from concurrent.futures import ThreadPoolExecutor

        def generator():
            pool = ThreadPoolExecutor(max_workers=prefetch_workers)
            try:
                pending = [
                    pool.submit(build, next(sels)) for _ in range(prefetch_depth)
                ]
                while True:
                    fut = pending.pop(0)
                    pending.append(pool.submit(build, next(sels)))
                    yield fut.result()
            finally:
                # non-blocking, errors swallowed: the generator may be
                # finalized during interpreter shutdown, where the threading/
                # queue modules are already torn down and any join raises
                try:
                    pool.shutdown(wait=False, cancel_futures=True)
                except Exception:
                    pass

        return generator()
