"""Host-streaming training path: aux pairing parity + e2e NS runs."""

import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.data.stream import AuxHostWindowLoader
from sciml_pde_tpu.data.windows import gather_windows
from sciml_pde_tpu.sim.gen_ns_incomp import VARIANTS, generate_ns_file
from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig
from sciml_pde_tpu.train.fno_train import run_training

pytestmark = pytest.mark.slow

TINY = dict(
    grid_size=(16, 16), dt=1e-3, n_steps=16, frame_int=2, n_batch=2,
    nu=0.01, cg_tol=1e-4, cg_max_iter=200,
)


@pytest.fixture(scope="module")
def ns_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("ns_stream")
    for i in [0, 1, 250]:
        generate_ns_file(folder / f"ns_incom_inhom_2d_256-{i}.h5", i, NSIncompConfig(**TINY))
    aux_cfg = NSIncompConfig(**{**TINY, **VARIANTS["convection"]})
    for i in range(4):
        generate_ns_file(folder / f"ns_aux_2d_256-{i}.h5", 100 + i, aux_cfg)
    generate_ns_file(folder / "ns_aux_2d_256-250.h5", 300, aux_cfg)
    # half-res aux family for the native-compute composition
    aux_lo_cfg = NSIncompConfig(**{**TINY, **VARIANTS["convection"],
                                   "grid_size": (8, 8)})
    for i in range(4):
        generate_ns_file(folder / f"ns_aux_2d_8-{i}.h5", 200 + i, aux_lo_cfg)
    return folder


def test_aux_host_loader_matches_device_gather():
    rng = np.random.default_rng(0)
    data_p = rng.normal(size=(4, 9, 5, 5, 3)).astype(np.float32)
    data_a = rng.normal(size=(8, 9, 5, 5, 3)).astype(np.float32)
    row_map = np.array([[0, 4], [1, 5], [2, 6], [3, 7]], np.int32)
    index = np.array([[2, 1], [0, 3]], np.int32)
    loader = AuxHostWindowLoader(
        data_p, data_a, index, initial_step=3, rollout=2, batch_size=2,
        num_aux=2, row_map=row_map, shuffle=False, prefetch=False,
    )
    x, y, xa, ya = next(iter(loader))
    wx, wy = gather_windows(jnp.asarray(data_p), jnp.asarray(index), 3, 2)
    np.testing.assert_allclose(x, np.asarray(wx), rtol=1e-6)
    np.testing.assert_allclose(y, np.asarray(wy), rtol=1e-6)
    # paired aux rows: row_map[p] at the same t0, grouped per primary row
    a_idx = np.array([[2, 1], [6, 1], [0, 3], [4, 3]], np.int32)
    wxa, wya = gather_windows(jnp.asarray(data_a), jnp.asarray(a_idx), 3, 2)
    np.testing.assert_allclose(xa, np.asarray(wxa), rtol=1e-6)
    np.testing.assert_allclose(ya, np.asarray(wya), rtol=1e-6)
    # DR pairing (no row map): ap = p*nA + k
    loader = AuxHostWindowLoader(
        data_p, data_a, index, initial_step=3, rollout=2, batch_size=2,
        num_aux=2, shuffle=False, prefetch=False,
    )
    _, _, xa, _ = next(iter(loader))
    a_idx = np.array([[4, 1], [5, 1], [0, 3], [1, 3]], np.int32)
    wxa, _ = gather_windows(jnp.asarray(data_a), jnp.asarray(a_idx), 3, 2)
    np.testing.assert_allclose(xa, np.asarray(wxa), rtol=1e-6)


def test_host_stream_baseline_e2e(ns_folder, tmp_path):
    res = run_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=False,
        train_subsample=(2, 2, 4), test_range=(250, 251),
        modes=4, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_ns_stream", log_every=0,
        host_stream=True,
    )
    assert np.isfinite(res.best_val)
    # the train store stayed on the host
    assert len(res.history) == 2


def test_host_stream_aux_e2e(ns_folder, tmp_path):
    res = run_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(2, 2, 4), num_aux_samples=2, test_range=(250, 251),
        modes=4, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_ns_stream_aux", log_every=0,
        host_stream=True,
    )
    assert np.isfinite(res.best_val)


def test_host_stream_native_aux_e2e(ns_folder, tmp_path):
    """host_stream + native-res aux store: the round-3 ds32 composition
    (8 primary files exceed HBM; the aux stream trains at its cheap
    native resolution)."""
    res = run_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(2, 2, 4), num_aux_samples=2, test_range=(250, 251),
        aux_name="ns_aux_2d_8",
        modes=3, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_ns_stream_native", log_every=0,
        host_stream=True, aux_upsample_at_gather=True, aux_native_compute=True,
        primary_store_dtype="bf16",
    )
    assert np.isfinite(res.best_val)


def test_host_stream_guards(ns_folder, tmp_path):
    with pytest.raises(ValueError):
        run_training(
            base_path=str(ns_folder), dataset_family="ns",
            train_subsample=(2, 2, 4), test_range=(250, 251),
            host_stream=True, shard_store=True,
            run_dir=str(tmp_path), model_name="t_guard",
        )
    # in-step upsample stays a device-store lever
    with pytest.raises(ValueError):
        run_training(
            base_path=str(ns_folder), dataset_family="ns", if_aux=True,
            train_subsample=(2, 2, 4), num_aux_samples=2,
            test_range=(250, 251), aux_name="ns_aux_2d_8",
            host_stream=True, aux_upsample_at_gather=True,
            run_dir=str(tmp_path), model_name="t_guard2",
        )


@pytest.fixture(scope="module")
def dr_folder(tmp_path_factory):
    from sciml_pde_tpu.sim.diff_react import DiffReactConfig
    from sciml_pde_tpu.sim.gen_diff_react import generate_dataset

    folder = tmp_path_factory.mktemp("dr_stream")
    cfg = dict(xdim=12, ydim=12, t=1.0, tdim=11)
    generate_dataset(
        folder / "2D_diff-react_test_all.h5", 9,
        DiffReactConfig(sim_type="all", **cfg), verbose=False,
    )
    generate_dataset(
        folder / "2D_diff-react_test_diff.h5", 13,
        DiffReactConfig(sim_type="diff", **cfg), verbose=False,
    )
    return str(folder) + "/"


def test_host_stream_dr_aux_e2e(dr_folder, tmp_path):
    res = run_training(
        base_path=dr_folder, aux_path=dr_folder, dataset_family="dr",
        if_aux=True, train_subsample=(8, 4, 12), num_aux_samples=3,
        modes=4, width=8, initial_step=5, rollout_test=1,
        batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_dr_stream_aux", log_every=0,
        host_stream=True,
    )
    assert np.isfinite(res.best_val)


def test_host_stream_dr_baseline_e2e(dr_folder, tmp_path):
    res = run_training(
        base_path=dr_folder, dataset_family="dr", if_aux=False,
        train_subsample=(8, 4, 12),
        modes=4, width=8, initial_step=5, rollout_test=1,
        batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_dr_stream_base", log_every=0,
        host_stream=True,
    )
    assert np.isfinite(res.best_val)
