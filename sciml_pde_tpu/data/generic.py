"""Generic HDF5 folder dataset + data-module wrapper.

Capability parity with the reference's φFlow-output dataset
(``pdebench/data_gen/src/pytorch_dataset.py:13-105``): ``HDF5Dataset``
indexes the leading (trajectory) dimension of every dataset in every
``.h5`` file of a folder and returns per-item dicts; ``HDF5DataModule``
is the Lightning-DataModule equivalent with contiguous train/val/test
splits and batched iteration (host-side numpy — this feeds exploratory
tooling, not the jitted train loop).
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np


class HDF5Dataset:
    """Every dataset of every .h5 file in a folder, indexed by trajectory.

    All datasets within a file must share the leading dimension; items
    are read lazily per access so huge stores never fully materialize.
    """

    def __init__(self, folder: str | Path, pattern: str = "*.h5"):
        self.files = sorted(Path(folder).glob(pattern))
        if not self.files:
            raise FileNotFoundError(f"no {pattern} files under {folder}")
        self._index: list[tuple[Path, int]] = []
        self._keys: dict[Path, list[str]] = {}
        for p in self.files:
            with h5py.File(p, "r") as f:
                keys = sorted(f.keys())
                lead = {f[k].shape[0] for k in keys}
                if len(lead) != 1:
                    raise ValueError(
                        f"{p.name}: datasets disagree on leading dim ({lead})"
                    )
                self._keys[p] = keys
                self._index.extend((p, b) for b in range(lead.pop()))

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        path, row = self._index[i]
        with h5py.File(path, "r") as f:
            return {k: np.asarray(f[k][row], np.float32) for k in self._keys[path]}


class HDF5DataModule:
    """Contiguous train/val/test splits over an ``HDF5Dataset`` with
    batched dict iteration (reference ``HDF5DatasetLightning``)."""

    def __init__(self, folder: str | Path, batch_size: int = 1,
                 splits=(0.8, 0.1, 0.1), pattern: str = "*.h5"):
        if len(splits) != 3:
            raise ValueError("splits must be (train, val, test) fractions")
        self.dataset = HDF5Dataset(folder, pattern)
        self.batch_size = int(batch_size)
        n = len(self.dataset)
        n_train = int(splits[0] * n)
        n_val = int(splits[1] * n)
        self._ranges = {
            "train": range(0, n_train),
            "val": range(n_train, n_train + n_val),
            "test": range(n_train + n_val, n),
        }

    def iter_split(self, split: str):
        idx = self._ranges[split]
        for b in range(0, len(idx), self.batch_size):
            items = [self.dataset[idx[j]] for j in range(b, min(b + self.batch_size, len(idx)))]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
