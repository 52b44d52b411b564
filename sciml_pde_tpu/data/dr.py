"""2D diffusion-reaction dataset loaders (primary / aux / downsampled).

Capability parity with the reference ``FNODatasetMult`` DR variant
(``pdebench/models/fno_aux/utils_2d_rd.py:14-183``):
  - single HDF5 files keyed by zero-padded seed groups
    (``/{seed:04d}/data`` (T, H, W, C) + ``/{seed:04d}/grid/{x,y,t}``);
  - 90/10 train/test split by sorted key order;
  - ``train_subsample = [baseline_n, aux_primary_n, aux_n]`` selection,
    a float < 1 keeping that fraction of the train split;
  - aux pairing: primary trajectory ``p`` <-> aux trajectories
    ``p*num_aux + (0..num_aux-1)`` at the same t0 (``utils_2d_rd.py:131-146``);
  - ``if_downsample``: trilinear T x H x W upsample of the aux stream to
    the primary resolution (``utils_2d_rd.py:120``).

Extension beyond the reference: ``extra_train_files`` presents a merged
view whose train pool continues past the primary file's seeds (for
``basic_ds128``+ presets) while the primary file's 90/10 split — and thus
the test set — stays byte-identical.

TPU-first: the selected trajectories are loaded once into an HBM-resident
``(N, T, H, W, C)`` store (``data/windows.py``); nothing here runs in the
training hot loop.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import h5py
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.windows import WindowedTrajectories

PRIMARY_FILE = "2D_diff-react_test_all.h5"
AUX_FILE = "2D_diff-react_test_diff.h5"
AUX_FILE_DOWNSAMPLED = "2D_diff-react_downsample_t50_96.h5"


@dataclasses.dataclass
class DRBaselineDataset:
    train: WindowedTrajectories
    test: WindowedTrajectories


@dataclasses.dataclass
class DRAuxDataset:
    primary_train: WindowedTrajectories
    primary_test: WindowedTrajectories
    aux_train: WindowedTrajectories
    # None selects the default p*num_aux+j pairing in the train step
    aux_row_map: np.ndarray | None = None


def _read_keys(path: Path, keys) -> np.ndarray:
    with h5py.File(path, "r") as f:
        return np.stack([np.asarray(f[k]["data"], np.float32) for k in keys])


def _read_grid(path: Path, key: str) -> np.ndarray:
    with h5py.File(path, "r") as f:
        x = np.asarray(f[key]["grid"]["x"], np.float32)
        y = np.asarray(f[key]["grid"]["y"], np.float32)
    gx, gy = np.meshgrid(x, y)  # (H, W) each; data spatial dims are (H=Ny, W=Nx)
    return np.stack([gx, gy], axis=-1)


def _sorted_keys(path: Path) -> list[str]:
    with h5py.File(path, "r") as f:
        return sorted(f.keys())


def _split_keys(keys: list[str]) -> tuple[list[str], list[str]]:
    """90/10 train/test by sorted key order (reference utils_2d_rd.py:60-67)."""
    n_train = int(0.9 * len(keys))
    return keys[:n_train], keys[n_train:]


def _take(train_keys: list[str], subsample) -> list[str]:
    if isinstance(subsample, float) and subsample < 1:
        return train_keys[: max(int(subsample * len(train_keys)), 1)]
    return train_keys[: int(subsample)]


def _load_train_pool(
    base: Path, primary_file: str, want, extra_train_files,
    leaky_clip: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Train pool (optionally merged across extension files) + test + grid.

    ``leaky_clip=True`` replicates the reference's raw
    ``sorted(keys)[:train_subsample]`` train list
    (``fno/utils_2d_rd_baseline.py:46-47``) WITHOUT excluding the test
    tail: on a 100-seed file with train_subsample >= 100 the 10 test
    seeds end up in the train pool (train/test leakage).  Exists only to
    quantify what that protocol bug is worth on the published ds128
    numbers — never use it for real results."""
    ppath = base / primary_file
    all_keys = _sorted_keys(ppath)
    train_keys, test_keys = _split_keys(all_keys)
    if leaky_clip:
        train_keys = all_keys
    grid = _read_grid(ppath, train_keys[0] if train_keys else test_keys[0])

    # resolve fractional subsample BEFORE any clipping so e.g. 0.5 means
    # half the train split in both modes
    if isinstance(want, float) and want < 1:
        want = max(int(want * len(train_keys)), 1)
    want = int(want)
    if leaky_clip:
        # the reference also clips silently when N exceeds the file
        want = min(want, len(all_keys))

    chunks = [_read_keys(ppath, train_keys[: min(want, len(train_keys))])]
    got = chunks[0].shape[0]
    for name in extra_train_files or []:
        if got >= want:
            break
        epath = base / name
        ekeys = _sorted_keys(epath)[: want - got]
        chunk = _read_keys(epath, ekeys)
        chunks.append(chunk)
        got += chunk.shape[0]
    if got < want:
        raise ValueError(
            f"requested {want} train trajectories but only {got} available "
            f"in {primary_file} (+{len(extra_train_files or [])} extension files)"
        )
    train = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
    test = _read_keys(ppath, test_keys)
    return train, test, grid


def load_dr_baseline(
    base_path: str,
    *,
    train_subsample=900,
    initial_step: int = 10,
    rollout_test: int = 1,
    extra_train_files: list[str] | None = None,
    primary_file: str = PRIMARY_FILE,
    to_device: bool = True,
    leaky_clip: bool = False,
) -> DRBaselineDataset:
    """Baseline (single-stream) DR dataset.

    Mirrors reference ``fno/utils_2d_rd_baseline.py``: train = first
    ``train_subsample`` of the 90% split, test = the 10% tail, one window
    at t0=0 per test trajectory.  ``leaky_clip`` replicates the
    reference's unguarded ``[:N]`` clip (see ``_load_train_pool``).
    """
    base = Path(base_path)
    train, test, grid = _load_train_pool(
        base, primary_file, train_subsample, extra_train_files,
        leaky_clip=leaky_clip,
    )
    return DRBaselineDataset(
        train=WindowedTrajectories(
            train, jnp.asarray(grid),
            initial_step=initial_step, rollout=rollout_test, train=True,
            to_device=to_device,
        ),
        test=WindowedTrajectories(
            test, jnp.asarray(grid),
            initial_step=initial_step, rollout=rollout_test, train=False,
        ),
    )


def _resize_trilinear(data: np.ndarray, target_thw: tuple[int, int, int]) -> jnp.ndarray:
    """(N, T', H', W', C) -> (N, T, H, W, C) trilinear upsample (reference
    ``utils_2d_rd.py:120`` F.interpolate mode='trilinear')."""
    import jax

    n, _, _, _, c = data.shape
    out_shape = (n, *target_thw, c)
    return jax.image.resize(jnp.asarray(data), out_shape, method="linear")


def load_dr_aux(
    base_path: str,
    aux_path: str | None = None,
    *,
    train_subsample=(900, 900, 900),
    num_aux_samples: int = 3,
    initial_step: int = 10,
    rollout_test: int = 1,
    if_downsample: bool = False,
    extra_train_files: list[str] | None = None,
    primary_file: str = PRIMARY_FILE,
    aux_file: str | None = None,
    to_device: bool = True,
) -> DRAuxDataset:
    """Two-stream DR dataset for aux joint training.

    ``train_subsample[1]`` primary + ``train_subsample[2]`` aux
    trajectories; the step pairs primary ``p`` with aux rows
    ``p*num_aux_samples + j`` so the aux pool must hold at least
    ``n_primary * num_aux_samples`` rows.
    """
    base = Path(base_path)
    apath = Path(aux_path) if aux_path else base
    primary_train, primary_test, grid = _load_train_pool(
        base, primary_file, train_subsample[1], extra_train_files
    )

    aux_name = aux_file or (AUX_FILE_DOWNSAMPLED if if_downsample else AUX_FILE)
    aux_keys = _sorted_keys(apath / aux_name)
    n_aux = train_subsample[2]
    if isinstance(n_aux, float) and n_aux < 1:
        n_aux = max(int(n_aux * len(aux_keys)), 1)
    n_aux = int(n_aux)
    aux = _read_keys(apath / aux_name, aux_keys[:n_aux])

    need = primary_train.shape[0] * num_aux_samples
    if aux.shape[0] < need:
        raise ValueError(
            f"aux pool has {aux.shape[0]} trajectories < "
            f"{primary_train.shape[0]} primary x {num_aux_samples} aux samples"
        )

    if if_downsample or aux.shape[1:4] != primary_train.shape[1:4]:
        aux_j = _resize_trilinear(aux, primary_train.shape[1:4])
        if not to_device:
            aux_j = np.asarray(aux_j)
    else:
        aux_j = aux if not to_device else jnp.asarray(aux)

    g = jnp.asarray(grid)
    return DRAuxDataset(
        primary_train=WindowedTrajectories(
            primary_train, g,
            initial_step=initial_step, rollout=rollout_test, train=True,
            to_device=to_device,
        ),
        primary_test=WindowedTrajectories(
            primary_test, g,
            initial_step=initial_step, rollout=rollout_test, train=False,
        ),
        aux_train=WindowedTrajectories(
            aux_j, g, initial_step=initial_step, rollout=rollout_test, train=True,
            to_device=to_device,
        ),
        aux_row_map=None,
    )
