"""Field renders of generated datasets (reference ``data_gen/src/plots.py``).

The reference ships matplotlib/phi-vis helpers that imshow simulation
fields and write pngs/gifs during generation (``plots.py:15-166``:
``plot_data``, ``save_phi_plot``, ``phi_plots``).  This module is the
schema-aware equivalent for our HDF5 layouts:

  - DR files: per-seed groups ``{seed:04d}/data`` of (T, X, Y, 2);
  - NS files: datasets ``velocity`` (B, T, X, Y, 2) / ``particles``
    (B, T, X, Y, 1).

``preview_dataset`` writes ``<file>.preview.png`` (frame strip at 5
times) and optionally ``<file>.preview.gif``; both gen CLIs expose it as
``--plot [--gif]``, and it runs standalone:

  python -m sciml_pde_tpu.sim.preview data/foo.h5 [--gif] [--channel 0]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import numpy as np


def _load_first_trajectory(path: Path) -> np.ndarray:
    """-> (T, X, Y, C) of the file's first trajectory, either schema."""
    with h5py.File(path, "r") as f:
        if "velocity" in f:  # NS schema
            vel = f["velocity"][0]  # (T, X, Y, 2)
            if "particles" in f:
                return np.concatenate([vel, f["particles"][0]], axis=-1)
            return vel
        keys = sorted(k for k in f.keys() if isinstance(f[k], h5py.Group))
        if not keys:
            raise ValueError(f"{path}: no trajectory groups or velocity dataset")
        return np.asarray(f[keys[0]]["data"])


def preview_dataset(
    path: str | Path,
    gif: bool = False,
    channel: int = 0,
    n_frames: int = 5,
    fps: int = 10,
) -> list[Path]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = Path(path)
    traj = _load_first_trajectory(path)
    written: list[Path] = []

    t_idx = np.linspace(0, traj.shape[0] - 1, n_frames).astype(int)
    fig, axes = plt.subplots(1, n_frames, figsize=(2.2 * n_frames, 2.4))
    for ax, t in zip(np.atleast_1d(axes), t_idx):
        ax.imshow(traj[t, ..., channel], cmap="viridis")
        ax.set_title(f"t={t}", fontsize=9)
        ax.axis("off")
    fig.suptitle(f"{path.name} ch{channel}", fontsize=10)
    fig.tight_layout()
    png = path.with_suffix(".preview.png")
    fig.savefig(png, dpi=110)
    plt.close(fig)
    written.append(png)

    if gif:
        from sciml_pde_tpu.plots.figures import field_animation

        out = path.with_suffix(".preview.gif")
        field_animation(out, traj, channel=channel, fps=fps, title=path.name)
        written.append(out)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("--gif", action="store_true")
    p.add_argument("--channel", type=int, default=0)
    p.add_argument("--fps", type=int, default=10)
    a = p.parse_args(argv)
    for w in preview_dataset(a.path, gif=a.gif, channel=a.channel, fps=a.fps):
        print(w)


if __name__ == "__main__":
    main()
