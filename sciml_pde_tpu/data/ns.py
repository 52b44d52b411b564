"""2D incompressible NS dataset loaders (primary / aux file pairing).

Capability parity with the reference ``FNODatasetMult`` NS variants
(``pdebench/models/fno_aux/utils_2d_ns.py:14-194`` and the baseline
``fno/utils_2d_ns_baseline.py``):
  - per-index files ``{sim_name}-{i}.h5`` holding ``velocity
    (B, T, X, Y, 2)`` + ``particles (B, T, X, Y, 1)`` (written by
    ``sciml_pde_tpu/sim/gen_ns_incomp.py``, schema ``data_io.py:17-123``);
    channels concatenate to a ``(B, T, X, Y, 3)`` store;
  - ``train_subsample`` as file count, or a float < 1 keeping
    ``int(B * frac)`` trajectories of file 0 (``utils_2d_ns.py:74-99``);
  - aux pairing: primary file ``f`` pairs with aux files
    ``f*num_aux_samples + j`` at the same within-file trajectory index
    (``utils_2d_ns.py:82-106``), expressed here as an explicit
    ``aux_row_map`` consumed on device by the jitted aux step;
  - test split: files ``test_range`` (reference files 250-274), one
    window at t0=0 each (``utils_2d_ns.py:117-123``);
  - ``if_downsample``: bilinear spatial upsample of the aux stream to the
    primary resolution (``utils_2d_ns.py:142``);
  - unit-square coordinate meshgrid.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import h5py
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.windows import WindowedTrajectories


@dataclasses.dataclass
class NSBaselineDataset:
    train: WindowedTrajectories
    test: WindowedTrajectories


@dataclasses.dataclass
class NSAuxDataset:
    primary_train: WindowedTrajectories
    primary_test: WindowedTrajectories
    aux_train: WindowedTrajectories
    aux_row_map: np.ndarray  # (num_primary_rows, num_aux_samples) int32


def _read_ns_file(path: Path) -> np.ndarray:
    """One NS file -> (B, T, X, Y, 3) = velocity ++ particles."""
    with h5py.File(path, "r") as f:
        vel = np.asarray(f["velocity"], np.float32)
        par = np.asarray(f["particles"], np.float32)
    return np.concatenate([vel, par], axis=-1)


def unit_grid(nx: int, ny: int) -> np.ndarray:
    gx, gy = np.meshgrid(
        np.linspace(0.0, 1.0, nx, dtype=np.float32),
        np.linspace(0.0, 1.0, ny, dtype=np.float32),
        indexing="ij",
    )
    return np.stack([gx, gy], axis=-1)


def _load_primary(base: Path, sim_name: str, subsample):
    """Train trajectories per ``train_subsample`` semantics.

    Returns (data (N, T, X, Y, 3), per_file_rows) where per_file_rows[f]
    lists the store rows of file f (needed for aux pairing).
    """
    if isinstance(subsample, float) and subsample < 1:
        block = _read_ns_file(base / f"{sim_name}-0.h5")
        keep = max(int(subsample * block.shape[0]), 1)
        return block[:keep], [list(range(keep))]
    files = [base / f"{sim_name}-{i}.h5" for i in range(int(subsample))]
    blocks = [_read_ns_file(p) for p in files]
    rows, per_file = [], []
    start = 0
    for b in blocks:
        per_file.append(list(range(start, start + b.shape[0])))
        start += b.shape[0]
    return np.concatenate(blocks), per_file


def _load_test(base: Path, sim_name: str, test_range) -> np.ndarray:
    blocks = [
        _read_ns_file(base / f"{sim_name}-{i}.h5") for i in range(*test_range)
    ]
    return np.concatenate(blocks)


def load_ns_baseline(
    base_path: str,
    *,
    train_subsample=1,
    initial_step: int = 10,
    rollout_test: int = 1,
    sim_name: str = "ns_incom_inhom_2d_256",
    test_range=(250, 275),
    to_device: bool = True,
    store_dtype: str | None = None,
) -> NSBaselineDataset:
    """``to_device=False`` keeps the train store in host RAM for the
    host-streaming pipeline (stores beyond one chip's HBM); the test
    store is small (one window per trajectory) and stays on device.

    ``store_dtype="bf16"`` halves the TRAIN store (the 8-file ds32
    baseline is 25.2 GB fp32 — past one v5e's HBM — vs 12.6 GB bf16);
    the train step casts gathered windows back to fp32 before any
    compute, and the test store / all metrics stay fp32 — same contract
    as the aux loader's ``store_dtype``."""
    base = Path(base_path)
    train, _ = _load_primary(base, sim_name, train_subsample)
    test = _load_test(base, sim_name, test_range)
    grid = jnp.asarray(unit_grid(train.shape[2], train.shape[3]))
    if store_dtype is not None:
        import ml_dtypes

        dt = {"bf16": ml_dtypes.bfloat16, "f32": np.float32}[store_dtype]
        train = train.astype(dt)
    return NSBaselineDataset(
        train=WindowedTrajectories(
            train, grid, initial_step=initial_step, rollout=rollout_test,
            train=True, to_device=to_device,
        ),
        test=WindowedTrajectories(
            # only the t0=0 window is ever read (train=False): keep just
            # those frames on device
            jnp.asarray(test[:, : initial_step + rollout_test]),
            grid, initial_step=initial_step, rollout=rollout_test, train=False,
        ),
    )


def load_ns_aux(
    base_path: str,
    aux_path: str | None = None,
    *,
    train_subsample=(900, 900, 900),
    num_aux_samples: int = 24,
    initial_step: int = 10,
    rollout_test: int = 1,
    sim_name: str = "ns_incom_inhom_2d_256",
    aux_name: str = "ns_aux_2d_256",
    if_downsample: bool = False,
    test_range=(250, 275),
    to_device: bool = True,
    aux_store_dtype: str | None = None,
    store_dtype: str | None = None,
    aux_upsample_at_gather: bool = False,
) -> NSAuxDataset:
    """Aux-paired NS dataset.

    Primary file ``f`` (``train_subsample[1]`` files, or a fraction of
    file 0) pairs with aux files ``f*num_aux_samples + j``; the row map
    resolves (primary row, j) -> aux store row for the on-device gather.
    ``train_subsample[2]`` bounds how many aux files are loaded.
    """
    base = Path(base_path)
    abase = Path(aux_path) if aux_path else base
    primary, per_file = _load_primary(base, sim_name, train_subsample[1])
    test = _load_test(base, sim_name, test_range)

    n_aux_files = int(train_subsample[2])
    need_files = len(per_file) * num_aux_samples
    if n_aux_files < need_files:
        raise ValueError(
            f"need {need_files} aux files ({len(per_file)} primary files x "
            f"{num_aux_samples} aux samples) but train_subsample[2]={n_aux_files}"
        )
    aux_blocks = [
        _read_ns_file(abase / f"{aux_name}-{i}.h5") for i in range(need_files)
    ]
    aux_rows_per_file = aux_blocks[0].shape[0]
    aux = np.concatenate(aux_blocks)
    if aux_store_dtype is not None:
        # bf16 aux store: the auxiliary stream is supervision for the aux
        # head only (primary data/metrics stay fp32), and halving it keeps
        # a >HBM/2 store under the chunked-transfer ceiling — the remote
        # AOT compiler does not honor buffer donation, so building an N-GB
        # device buffer incrementally peaks at ~2N (utils/transfer.py).
        import ml_dtypes

        dt = {"bf16": ml_dtypes.bfloat16, "f32": np.float32}[aux_store_dtype]
        aux = aux.astype(dt)

    # (primary row, j) -> aux row: same within-file trajectory index b in
    # aux file f*num_aux + j (reference utils_2d_ns.py:82-106)
    row_map = np.empty((primary.shape[0], num_aux_samples), np.int32)
    for f, rows in enumerate(per_file):
        for b, p_row in enumerate(rows):
            for j in range(num_aux_samples):
                row_map[p_row, j] = (f * num_aux_samples + j) * aux_rows_per_file + b

    if aux_upsample_at_gather:
        # keep the aux store at its native (cheaper) resolution; the train
        # step bilinear-upsamples gathered windows to the primary grid
        # (the reference's gather-time interpolate, utils_2d_ns.py:139-161)
        # — a 128^2 store is 4x less HBM than load-time upsampling to 256^2
        aux_j = aux
    elif if_downsample or aux.shape[2:4] != primary.shape[2:4]:
        import jax

        target = (aux.shape[0], aux.shape[1], *primary.shape[2:4], aux.shape[-1])
        if to_device:
            aux_j = jax.image.resize(jnp.asarray(aux), target, method="linear")
        else:
            # host-resident resize (chunked so peak memory stays bounded)
            aux_j = np.concatenate([
                np.asarray(jax.image.resize(jnp.asarray(aux[i : i + 1]),
                                            (1,) + target[1:], method="linear"))
                for i in range(aux.shape[0])
            ])
    else:
        # numpy through to WindowedTrajectories, which chunk-transfers it
        aux_j = aux

    grid = jnp.asarray(unit_grid(primary.shape[2], primary.shape[3]))
    if store_dtype is not None:
        # bf16 primary TRAIN store: at reference batch sizes the 8-primary
        # + 24-aux 256^2 family plus the aux step's HLO temps exceed one
        # chip's HBM in fp32 (18.7 > 15.75 GB measured); the train step
        # casts gathered windows back to fp32 before any compute, and the
        # test store / all metrics stay fp32.
        import ml_dtypes

        dt = {"bf16": ml_dtypes.bfloat16, "f32": np.float32}[store_dtype]
        primary = primary.astype(dt)
    return NSAuxDataset(
        primary_train=WindowedTrajectories(
            primary, grid, initial_step=initial_step, rollout=rollout_test,
            train=True, to_device=to_device,
        ),
        primary_test=WindowedTrajectories(
            # in-training val uses only the t0=0 window: keep just those
            # frames on device (the full 256^2 x 1000-frame test file is
            # 1.57 GB of dead HBM weight; post-training rollouts reload)
            jnp.asarray(test[:, : initial_step + rollout_test]),
            grid, initial_step=initial_step, rollout=rollout_test, train=False,
        ),
        aux_train=WindowedTrajectories(
            aux_j, grid, initial_step=initial_step, rollout=rollout_test,
            train=True, to_device=to_device,
        ),
        aux_row_map=row_map,
    )
