"""Rollout trajectory export for visualization.

Capability parity with ``pdebench/models/fno_aux/prediction_2d_ns.py:121-170``
(and the _2d_dr/_3d_ns twins): load a trained checkpoint, unroll the model
over full test trajectories feeding predictions back, and write per-sample
HDF5 files with the predicted fields.

TPU-first: the unroll is one ``lax.scan`` (eval/rollout.py) per trajectory
batch rather than a python loop.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.windows import WindowedTrajectories, gather_windows
from sciml_pde_tpu.eval.rollout import rollout_predict


def export_rollout_trajectories(
    apply_fn,
    params,
    test: WindowedTrajectories,
    steps: int,
    out_dir: str | Path,
    prefix: str = "2D_NS_pred_trj",
    batch_size: int = 4,
) -> list[Path]:
    """Write ``{prefix}_sample{i}.h5`` with dataset 'data'
    (steps, *spatial, C) per test trajectory."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idx = test.window_index()
    paths = []
    import jax

    @jax.jit
    def roll(p, chunk):
        x, _ = gather_windows(test.data, chunk, test.initial_step, 0)
        gb = jnp.broadcast_to(test.grid[None], (chunk.shape[0],) + test.grid.shape)
        return rollout_predict(lambda a, b: apply_fn(p, a, b), x, gb, steps)

    for b in range(0, len(idx), batch_size):
        chunk = jnp.asarray(idx[b : b + batch_size])
        preds = np.asarray(roll(params, chunk))  # (B, *spatial, steps, C)
        for j in range(preds.shape[0]):
            i = b + j
            path = out_dir / f"{prefix}_sample{i}.h5"
            traj = np.moveaxis(preds[j], -2, 0)  # (steps, *spatial, C)
            with h5py.File(path, "w") as f:
                f.create_dataset("data", data=traj, compression="lzf")
            paths.append(path)
    return paths
