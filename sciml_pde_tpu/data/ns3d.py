"""3D NS plume (ScalarFlow-style) dataset loaders.

Capability parity with the reference ``FNODatasetMult`` 3D variant
(``pdebench/models/fno_aux/utils_3d_ns.py:13-218``): per-seed file pairs
``v_trj_seed{i}{suffix}.h5`` (X, Y, Z, T, 3) + ``s_trj_seed{i}{suffix}.h5``
(T, X, Y, Z) — written by ``sciml_pde_tpu/sim/ns_plume_3d.py`` — combined
into a 4-channel ``(T, X, Y, Z, 4)`` trajectory (velocity ++ smoke).
Primary stream = ``_interp`` files; aux stream = suffix-less decomposed
runs; test = held-out seeds (reference seeds 275-299).
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path

import h5py
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.windows import WindowedTrajectories


@dataclasses.dataclass
class NS3DAuxDataset:
    primary_train: WindowedTrajectories
    primary_test: WindowedTrajectories
    aux_train: WindowedTrajectories
    # None selects the default p*num_aux+j pairing in the train step
    aux_row_map: np.ndarray | None = None


def _read_pair(folder: Path, seed: int, suffix: str) -> np.ndarray:
    """One seed -> (T, X, Y, Z, 4)."""
    with h5py.File(folder / f"v_trj_seed{seed}{suffix}.h5", "r") as f:
        v = np.asarray(f["data"], np.float32)  # (X, Y, Z, T, 3) on disk
    with h5py.File(folder / f"s_trj_seed{seed}{suffix}.h5", "r") as f:
        s = np.asarray(f["data"], np.float32)  # (T, X, Y, Z)
    v = np.moveaxis(v, 3, 0)  # (T, X, Y, Z, 3)
    return np.concatenate([v, s[..., None]], axis=-1)


def _available_seeds(folder: Path, suffix: str) -> list[int]:
    pat = re.compile(rf"^v_trj_seed(\d+){re.escape(suffix)}\.h5$")
    seeds = []
    for p in folder.glob("v_trj_seed*.h5"):
        m = pat.match(p.name)
        if m:
            seeds.append(int(m.group(1)))
    return sorted(seeds)


def unit_grid_3d(nx: int, ny: int, nz: int) -> np.ndarray:
    gx, gy, gz = np.meshgrid(
        np.linspace(0.0, 1.0, nx, dtype=np.float32),
        np.linspace(0.0, 1.0, ny, dtype=np.float32),
        np.linspace(0.0, 1.0, nz, dtype=np.float32),
        indexing="ij",
    )
    return np.stack([gx, gy, gz], axis=-1)


def load_ns3d_aux(
    base_path: str,
    aux_path: str | None = None,
    *,
    train_subsample=(900, 900, 900),
    num_aux_samples: int = 3,
    initial_step: int = 10,
    rollout_test: int = 1,
    test_seeds=range(275, 300),
    to_device: bool = True,
    with_aux: bool = True,
    aux_store_dtype: str | None = None,
    store_dtype: str | None = None,
) -> NS3DAuxDataset:
    """Primary ``_interp`` seeds (excluding ``test_seeds``) + suffix-less
    aux seeds; aux pairing is the default ``p*num_aux_samples + j``
    scheme, so the aux pool must hold ``n_primary * num_aux_samples``
    trajectories.  ``with_aux=False`` (baseline training) skips loading
    and validating the aux pool entirely."""
    base = Path(base_path)
    abase = Path(aux_path) if aux_path else base
    test_set = set(int(s) for s in test_seeds)

    train_pool = [s for s in _available_seeds(base, "_interp") if s not in test_set]
    n_primary = int(train_subsample[1])
    if len(train_pool) < n_primary:
        raise ValueError(
            f"{len(train_pool)} primary _interp seeds available < {n_primary}"
        )
    primary = np.stack([_read_pair(base, s, "_interp") for s in train_pool[:n_primary]])
    test = np.stack([_read_pair(base, s, "_interp") for s in sorted(test_set)])

    aux = None
    if with_aux:
        aux_pool = _available_seeds(abase, "")
        n_aux = int(train_subsample[2])
        if len(aux_pool) < n_aux:
            raise ValueError(f"{len(aux_pool)} aux seeds available < {n_aux}")
        aux = np.stack([_read_pair(abase, s, "") for s in aux_pool[:n_aux]])

        need = n_primary * num_aux_samples
        if aux.shape[0] < need:
            raise ValueError(
                f"aux pool has {aux.shape[0]} trajectories < {n_primary} primary "
                f"x {num_aux_samples} aux samples"
            )
        if aux_store_dtype is not None:
            # bf16 aux store: same rationale as load_ns_aux — auxiliary
            # supervision only, halves a >HBM/2 device store
            import ml_dtypes

            dt = {"bf16": ml_dtypes.bfloat16, "f32": np.float32}[aux_store_dtype]
            aux = aux.astype(dt)

    if store_dtype is not None:
        # bf16 primary TRAIN store, same contract as load_ns_aux: the
        # train step casts gathered windows back to fp32 before compute;
        # the test store / all metrics stay fp32.
        import ml_dtypes

        dt = {"bf16": ml_dtypes.bfloat16, "f32": np.float32}[store_dtype]
        primary = primary.astype(dt)

    grid = jnp.asarray(unit_grid_3d(*primary.shape[2:5]))
    return NS3DAuxDataset(
        primary_train=WindowedTrajectories(
            primary, grid, initial_step=initial_step, rollout=rollout_test,
            train=True, to_device=to_device,
        ),
        primary_test=WindowedTrajectories(
            # training-time val reads only the t0=0 window: keep just
            # those frames on device (full-length 3D test is ~2.1 GB)
            test[:, : initial_step + rollout_test] if to_device else test,
            grid, initial_step=initial_step, rollout=rollout_test,
            train=False, to_device=to_device,
        ),
        aux_train=(WindowedTrajectories(
            aux, grid, initial_step=initial_step, rollout=rollout_test,
            train=True, to_device=to_device,
        ) if aux is not None else None),
        aux_row_map=None,
    )
