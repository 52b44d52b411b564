"""Dataset preview renders (sim/preview.py, reference data_gen/src/plots.py)."""

import h5py
import numpy as np
import pytest

from sciml_pde_tpu.sim.preview import preview_dataset


@pytest.fixture()
def dr_file(tmp_path):
    path = tmp_path / "dr.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for s in range(2):
            g = f.create_group(f"{s:04d}")
            g.create_dataset("data", data=rng.normal(size=(7, 8, 8, 2)).astype("f4"))
    return path


@pytest.fixture()
def ns_file(tmp_path):
    path = tmp_path / "ns.h5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        f.create_dataset("velocity", data=rng.normal(size=(2, 6, 8, 8, 2)).astype("f4"))
        f.create_dataset("particles", data=rng.normal(size=(2, 6, 8, 8, 1)).astype("f4"))
    return path


def test_dr_preview_png_and_gif(dr_file):
    written = preview_dataset(dr_file, gif=True)
    assert [w.suffix for w in written] == [".png", ".gif"]
    for w in written:
        assert w.exists() and w.stat().st_size > 0


def test_ns_preview_reads_velocity_plus_particles(ns_file):
    (png,) = preview_dataset(ns_file, channel=2)  # particles channel exists
    assert png.exists() and png.stat().st_size > 0


def test_empty_file_raises(tmp_path):
    path = tmp_path / "empty.h5"
    with h5py.File(path, "w"):
        pass
    with pytest.raises(ValueError):
        preview_dataset(path)
