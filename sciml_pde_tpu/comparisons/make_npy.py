"""Velocity-HDF5 -> 64x64 magnitude-frame .npy converter.

Capability parity with the Hyena suite's data prep
("Hyena Model Comparison/make_npy_from_h5.py"): accepts velocity arrays
of rank 3-5 in channel-first or channel-last layout, computes the speed
|v| per frame, resizes to 64x64 (bilinear, via ``jax.image.resize``
instead of scipy.ndimage.zoom) and stacks all frames of all files into
one (N, 64, 64) float32 npy.
"""

from __future__ import annotations

import argparse
import glob
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np


def to_mag_frames(arr: np.ndarray, size: int = 64) -> np.ndarray:
    """Any supported velocity layout -> (N, size, size) float32 |v| frames."""
    a = np.asarray(arr)
    if a.shape[-1] == 2:
        pass
    elif a.shape[0] == 2:
        a = np.moveaxis(a, 0, -1)
    else:
        raise ValueError(f"can't find 2-channel axis in shape {a.shape}")
    if a.ndim == 5:  # (case, T, H, W, 2)
        a = a.reshape(-1, *a.shape[2:])
    elif a.ndim == 3:  # (H, W, 2)
        a = a[None]
    elif a.ndim != 4:
        raise ValueError(f"unsupported rank {a.ndim}")
    mag = np.linalg.norm(a, axis=-1)  # (N, H, W)
    out = jax.image.resize(jnp.asarray(mag), (mag.shape[0], size, size), "bilinear")
    return np.asarray(out, dtype=np.float32)


def convert_dir(src_dir: str | Path, out_path: str | Path,
                velocity_key: str = "velocity", size: int = 64) -> Path:
    frames = []
    paths = sorted(glob.glob(str(Path(src_dir) / "*.h5")))
    if not paths:
        raise FileNotFoundError(f"no .h5 files under {src_dir}")
    for p in paths:
        with h5py.File(p, "r") as f:
            key = velocity_key if velocity_key in f else next(iter(f))
            frames.append(to_mag_frames(np.asarray(f[key]), size=size))
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.save(out_path, np.concatenate(frames, axis=0))
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="dir of velocity .h5 files")
    p.add_argument("--out", default="data/ns_mag64.npy")
    p.add_argument("--key", default="velocity")
    p.add_argument("--size", type=int, default=64)
    a = p.parse_args(argv)
    out = convert_dir(a.src, a.out, velocity_key=a.key, size=a.size)
    print(f"wrote {out}: {np.load(out, mmap_mode='r').shape}")


if __name__ == "__main__":
    main()
