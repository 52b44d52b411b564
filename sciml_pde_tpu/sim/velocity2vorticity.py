"""CLI: convert PDEBench 3D CFD velocity HDF5 (Vx/Vy/Vz) to vorticity files.

Reference: ``pdebench/data_gen/velocity2vorticity.py`` (console script
``velocity2vorticity``, pyproject.toml:207-208): reads Vx/Vy/Vz (+ x/y/z/t
coords), computes spectral vorticity per frame, writes ``omega_x/y/z`` into
a ``*_vorticity.h5`` sibling file.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.sim.vorticity import compute_spectral_vorticity_jnp


def convert_velocity(h5path: str | Path, batch: int = 4) -> Path:
    h5path = Path(h5path)
    out = h5path.with_name(h5path.stem + "_vorticity.h5")
    with h5py.File(h5path, "r") as fin, h5py.File(out, "w") as fout:
        vx, vy, vz = fin["Vx"], fin["Vy"], fin["Vz"]  # (N, T, X, Y, Z) or (T, X, Y, Z)
        for key in ("x-coordinate", "y-coordinate", "z-coordinate", "t-coordinate"):
            if key in fin:
                fout.create_dataset(key, data=np.asarray(fin[key]))
        dx = float(fin["x-coordinate"][1] - fin["x-coordinate"][0]) if "x-coordinate" in fin else 1.0
        dy = float(fin["y-coordinate"][1] - fin["y-coordinate"][0]) if "y-coordinate" in fin else 1.0
        dz = float(fin["z-coordinate"][1] - fin["z-coordinate"][0]) if "z-coordinate" in fin else 1.0

        shape = vx.shape
        outs = {
            k: fout.create_dataset(k, shape, dtype="float32", compression="lzf")
            for k in ("omega_x", "omega_y", "omega_z")
        }
        n = shape[0]
        for i in range(0, n, batch):
            sl = slice(i, min(i + batch, n))
            vel = jnp.stack(
                [jnp.asarray(vx[sl]), jnp.asarray(vy[sl]), jnp.asarray(vz[sl])], axis=-1
            )
            sx, sy, sz = vel.shape[-4:-1]
            w = compute_spectral_vorticity_jnp(
                vel.reshape((-1, sx, sy, sz, 3)), sx * dx, sy * dy, sz * dz
            ).reshape(vel.shape)
            outs["omega_x"][sl] = np.asarray(w[..., 0])
            outs["omega_y"][sl] = np.asarray(w[..., 1])
            outs["omega_z"][sl] = np.asarray(w[..., 2])
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="PDEBench 3D CFD hdf5 with Vx/Vy/Vz")
    p.add_argument("--batch", type=int, default=4)
    a = p.parse_args(argv)
    out = convert_velocity(a.input, a.batch)
    print(out)


if __name__ == "__main__":
    main()
