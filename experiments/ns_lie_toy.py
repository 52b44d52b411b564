"""Controlled fno_lie study at toy scale (CPU-runnable).

The reference sweeps a Lie-point-symmetry-augmented FNO baseline
(``pdebench/models/run_forward_ns.sh`` variant ``fno_lie``, engine
``pdebench/models/fno/transformations.py:17-179``, loader
``fno/utils_2d_ns_baseline_lie.py:161-209``) but publishes no numbers for
it.  This driver lands the baseline-vs-lie pair the component inventory
needs: it carves a toy 64^2 dataset out of an existing 256^2 production
primary file (strided spatial subsample; trajectories 0..2 -> train file,
trajectory 3 -> test file 250) and trains the two variants at an identical
budget through the SAME production driver (``experiments/ns_production.py``),
so the only delta is ``lie_augment``.

Usage:
  python experiments/ns_lie_toy.py [--epochs 20] [--stride 4]
      [--src data/ns_production/ns_incom_inhom_2d_256-0.h5]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import h5py
import numpy as np


def build_toy_folder(src: Path, folder: Path, stride: int, tstride: int = 1) -> None:
    folder.mkdir(parents=True, exist_ok=True)
    train_f = folder / "ns_incom_inhom_2d_256-0.h5"
    test_f = folder / "ns_incom_inhom_2d_256-250.h5"
    if train_f.exists() and test_f.exists():
        print(f"toy folder {folder} already built")
        return
    with h5py.File(src, "r") as f:
        vel = f["velocity"][:, ::tstride, ::stride, ::stride, :]
        part = f["particles"][:, ::tstride, ::stride, ::stride, :]
        force = f["force"][:, ::stride, ::stride, :]
        t = f["t"][:, ::tstride]
        cfg = dict(f.attrs)

    def write(path: Path, sl: slice) -> None:
        with h5py.File(path, "w") as f:
            for name, arr in [
                ("velocity", vel[sl]),
                ("particles", part[sl]),
                ("force", force[sl]),
                ("t", t[sl]),
            ]:
                f.create_dataset(name, data=arr, compression="lzf")
            for k, v in cfg.items():
                f.attrs[k] = v

    write(train_f, slice(0, 3))
    write(test_f, slice(3, 4))
    print(f"toy folder {folder}: train {vel[:3].shape}, test {vel[3:4].shape}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="data/ns_production/ns_incom_inhom_2d_256-0.h5")
    p.add_argument("--folder", default="data/ns_lie_toy")
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--tstride", type=int, default=1,
                   help="temporal subsample of the source trajectory")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default="runs/ns_lie_toy")
    p.add_argument("--variants", nargs="+", default=["baseline", "lie"])
    a = p.parse_args(argv)

    build_toy_folder(Path(a.src), Path(a.folder), a.stride, a.tstride)

    from experiments.ns_production import main as ns_main

    ns_main(
        [
            "--skip-gen",
            "--folder", a.folder,
            "--variants", *a.variants,
            "--n-primary", "1",
            "--n-test", "1",
            "--epochs", str(a.epochs),
            "--batch-size", str(a.batch_size),
            "--out", a.out,
            "--tag", f"toy{256 // a.stride}",
        ]
    )
    print(json.dumps(json.loads((Path(a.out) / "summary.json").read_text()), indent=1))


if __name__ == "__main__":
    main()
