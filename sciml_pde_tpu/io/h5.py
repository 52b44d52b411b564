"""HDF5 dataset schema, byte-compatible with the reference generators.

Diffusion-reaction layout (reference ``pdebench/data_gen/gen_diff_react.py:51-85``):
  /{seed:04d}/data          (T, Ny, Nx, C) float32, lzf
  /{seed:04d}/grid/{x,y,t}  float32, lzf

so datasets written here are loadable by the reference loaders and vice
versa.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np


def write_seed_group(
    path: str | Path,
    seed: int,
    data: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    t: np.ndarray,
    config_yaml: str = "",
    max_retries: int = 50,
) -> None:
    """Append one seed group; OSError-retry loop for concurrent writers
    (reference gen_diff_react.py:53-90)."""
    import time

    seed_str = str(seed).zfill(4)
    for attempt in range(max_retries):
        try:
            with h5py.File(path, "a") as f:
                f.create_dataset(
                    f"{seed_str}/data", data=data, dtype="float32", compression="lzf"
                )
                f.create_dataset(f"{seed_str}/grid/x", data=x, dtype="float32", compression="lzf")
                f.create_dataset(f"{seed_str}/grid/y", data=y, dtype="float32", compression="lzf")
                f.create_dataset(f"{seed_str}/grid/t", data=t, dtype="float32", compression="lzf")
                if config_yaml:
                    f[seed_str].attrs["config"] = config_yaml
            return
        except OSError:
            if attempt == max_retries - 1:
                raise
            time.sleep(0.1)


def list_seed_groups(path: str | Path) -> list[str]:
    with h5py.File(path, "r") as f:
        return sorted(f.keys())


def read_seed_data(path: str | Path, key: str) -> np.ndarray:
    with h5py.File(path, "r") as f:
        return np.asarray(f[key]["data"], dtype=np.float32)


def read_seed_grid(path: str | Path, key: str) -> dict[str, np.ndarray]:
    with h5py.File(path, "r") as f:
        g = f[key]["grid"]
        return {k: np.asarray(g[k], dtype=np.float32) for k in g.keys()}
