"""Smaller parity components: generic HDF5 dataset, partial param loading,
uploader command, vorticity, 3D transformer training path."""

import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from sciml_pde_tpu.data.generic import HDF5Dataset, HDF5DataModule
from sciml_pde_tpu.utils.checkpoint import load_partial_params
from sciml_pde_tpu.utils.upload import dataverse_upload
from sciml_pde_tpu.sim.vorticity import compute_spectral_vorticity_jnp

pytestmark = pytest.mark.slow


@pytest.fixture()
def h5_dir(tmp_path):
    for i in range(2):
        with h5py.File(tmp_path / f"f{i}.h5", "w") as f:
            f.create_dataset("velocity", data=np.random.rand(3, 4, 4, 2).astype(np.float32))
            f.create_dataset("particles", data=np.random.rand(3, 4, 4, 1).astype(np.float32))
    return tmp_path


def test_hdf5_dataset_and_module(h5_dir):
    ds = HDF5Dataset(h5_dir)
    assert len(ds) == 6
    item = ds[0]
    assert item["velocity"].shape == (4, 4, 2)
    dm = HDF5DataModule(h5_dir, batch_size=2, splits=(0.5, 0.25, 0.25))
    batches = list(dm.iter_split("train"))
    assert batches[0]["velocity"].shape == (2, 4, 4, 2)


def test_load_partial_params():
    fresh = {"a": {"k": np.zeros((2, 2))}, "b": np.zeros((3,))}
    pre = {"a": {"k": np.ones((2, 2))}, "b": np.ones((4,))}  # b mismatched
    out = load_partial_params(fresh, pre, verbose=False)
    np.testing.assert_array_equal(out["a"]["k"], 1.0)
    np.testing.assert_array_equal(out["b"], 0.0)


def test_uploader_builds_curl_cmd(tmp_path):
    f = tmp_path / "x.h5"
    f.write_bytes(b"")
    cmd = dataverse_upload(f, "https://example", "tok", "doi:x", "dir", dry_run=True)
    assert cmd[0] == "curl" and "--retry" in cmd


def test_vorticity_of_shear_flow():
    # v = (0, x, 0) on a periodic box -> omega_z = dv/dx = 1
    n = 16
    x = np.linspace(0, 1, n, endpoint=False)
    X = np.broadcast_to(x[:, None, None], (n, n, n))
    vel = np.zeros((1, n, n, n, 3), np.float32)
    vel[0, ..., 1] = np.sin(2 * np.pi * X)  # vy = sin(2 pi x)
    w = np.asarray(compute_spectral_vorticity_jnp(jnp.asarray(vel)))
    want_wz = 2 * np.pi * np.cos(2 * np.pi * X)
    np.testing.assert_allclose(w[0, ..., 2], want_wz, atol=1e-3)
    np.testing.assert_allclose(w[0, ..., 0], 0.0, atol=1e-4)


def test_transformer3d_training_family(tmp_path):
    from sciml_pde_tpu.sim.ns_plume_3d import Plume3DConfig, generate_plume_files
    from sciml_pde_tpu.train.fno_train import run_training

    cfg = Plume3DConfig(
        res=(8, 8, 10), dt=1e-3, n_frames=6, substeps=1, cg_max_iter=50,
        out_res=(8, 8, 10), out_frames=6,
    )
    folder = tmp_path / "p3d"
    for i in [0, 275]:
        generate_plume_files(folder, i, cfg, suffix="_interp")
    for i in [0, 1, 2]:
        generate_plume_files(folder, i, cfg, suffix="")

    res = run_training(
        base_path=str(folder), aux_path=str(folder),
        dataset_family="ns3d", if_aux=True, model_family="transformer3d",
        transformer_kwargs=dict(
            patch_size=(4, 4, 5), tubelet_size=2, encoder_dim=32,
            encoder_depth=1, encoder_heads=4, decoder_dim=16,
            decoder_depth=1, decoder_heads=2,
        ),
        train_subsample=(1, 1, 3), num_aux_samples=3,
        test_range=(275, 276), num_channels=4,
        initial_step=4, batch_size=2, epochs=1,
        run_dir=str(tmp_path / "run"), model_name="t3d", log_every=1000,
    )
    assert np.isfinite(res.best_val)
