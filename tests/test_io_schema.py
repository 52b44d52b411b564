"""On-disk schema parity with the reference writers."""

import json

import h5py
import numpy as np

from sciml_pde_tpu.io.h5 import write_seed_group, list_seed_groups, read_seed_data, read_seed_grid
from sciml_pde_tpu.sim.gen_ns_incomp import write_ns_h5


def test_dr_seed_group_schema(tmp_path):
    p = tmp_path / "dr.h5"
    data = np.random.rand(5, 8, 8, 2).astype(np.float32)
    x = np.linspace(-1, 1, 8).astype(np.float32)
    t = np.linspace(0, 5, 5).astype(np.float32)
    write_seed_group(p, 7, data, x, x, t, config_yaml="cfg")
    write_seed_group(p, 12, data, x, x, t)
    # reference layout: zero-padded groups with data + grid/{x,y,t}
    assert list_seed_groups(p) == ["0007", "0012"]
    with h5py.File(p) as f:
        assert f["0007"]["data"].shape == (5, 8, 8, 2)
        assert set(f["0007"]["grid"].keys()) == {"x", "y", "t"}
        assert f["0007"].attrs["config"] == "cfg"
        assert f["0007"]["data"].compression == "lzf"
    np.testing.assert_allclose(read_seed_data(p, "0007"), data)
    assert read_seed_grid(p, "0012")["t"].shape == (5,)


def test_ns_file_schema(tmp_path):
    p = tmp_path / "ns.h5"
    b, t, n = 2, 4, 8
    vel = np.random.rand(b, t, n, n, 2).astype(np.float32)
    par = np.random.rand(b, t, n, n, 1).astype(np.float32)
    force = np.random.rand(b, n, n, 2).astype(np.float32)
    ts = np.random.rand(b, t).astype(np.float32)
    write_ns_h5(p, vel, par, force, ts, {"sim_name": "x"})
    with h5py.File(p) as f:
        # reference data_io.dims_for shapes + chunking (1,1,spatial...)
        assert f["velocity"].shape == (b, t, n, n, 2)
        assert f["particles"].shape == (b, t, n, n, 1)
        assert f["force"].shape == (b, n, n, 2)
        assert f["t"].shape == (b, t)
        assert f["velocity"].chunks == (1, 1, n, n, 2)
        assert f["velocity"].compression == "lzf"
        assert f["velocity"].shuffle
        assert f.attrs["latestIndex"] == t - 1
        assert json.loads(f.attrs["config"])["sim_name"] == "x"
