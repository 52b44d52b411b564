"""Merged-view DR loader: extra train files extend the pool, split intact."""

import numpy as np

from sciml_pde_tpu.data.dr import load_dr_baseline
from sciml_pde_tpu.sim.diff_react import DiffReactConfig
from sciml_pde_tpu.sim.gen_diff_react import generate_dataset

CFG = dict(xdim=8, ydim=8, t=0.5, tdim=5)


def test_extra_train_files_extend_pool(tmp_path):
    generate_dataset(tmp_path / "2D_diff-react_test_all.h5", 10,
                     DiffReactConfig(sim_type="react", **CFG), verbose=False)
    generate_dataset(tmp_path / "2D_diff-react_ext.h5", 6,
                     DiffReactConfig(sim_type="react", **CFG),
                     seed_start=100, verbose=False)

    base = load_dr_baseline(str(tmp_path), train_subsample=9, initial_step=2)
    assert base.train.num_trajectories == 9
    assert base.test.num_trajectories == 1  # last 10% of the primary file

    merged = load_dr_baseline(
        str(tmp_path), train_subsample=13, initial_step=2,
        extra_train_files=["2D_diff-react_ext.h5"],
    )
    # 9 from the primary train split + 4 from the extension
    assert merged.train.num_trajectories == 13
    assert merged.test.num_trajectories == 1
    # primary train trajectories identical in both views
    np.testing.assert_array_equal(
        np.asarray(base.train.data), np.asarray(merged.train.data[:9])
    )


def test_downsample_tool_roundtrip(tmp_path):
    from sciml_pde_tpu.sim.downsample_dr import downsample_file
    from sciml_pde_tpu.data.dr import load_dr_aux

    generate_dataset(tmp_path / "2D_diff-react_test_all.h5", 10,
                     DiffReactConfig(sim_type="react", **CFG), verbose=False)
    generate_dataset(tmp_path / "2D_diff-react_test_diff.h5", 10,
                     DiffReactConfig(sim_type="diff", **CFG), verbose=False)
    n = downsample_file(
        tmp_path / "2D_diff-react_test_diff.h5",
        tmp_path / "2D_diff-react_downsample_t50_96.h5", tdim=3, res=4,
        verbose=False,
    )
    assert n == 10
    import h5py
    with h5py.File(tmp_path / "2D_diff-react_downsample_t50_96.h5") as f:
        assert sorted(f.keys())[0] == "0000"
        assert f["0000/data"].shape == (3, 4, 4, 2)
        assert f["0000/grid/x"].shape == (4,)

    # the ts_down loader path upsamples it back to the primary resolution
    ds = load_dr_aux(str(tmp_path), train_subsample=(4, 2, 6),
                     num_aux_samples=3, initial_step=2, if_downsample=True)
    assert ds.aux_train.data.shape[1:] == ds.primary_train.data.shape[1:]


def test_leaky_clip_replicates_reference_clip(tmp_path):
    """leaky_clip=True reproduces the reference's sorted(keys)[:N] train
    list (fno/utils_2d_rd_baseline.py:46-47): the test tail joins the
    train pool and an oversized N clips silently to the file size."""
    generate_dataset(tmp_path / "2D_diff-react_test_all.h5", 10,
                     DiffReactConfig(sim_type="react", **CFG), verbose=False)

    leaky = load_dr_baseline(
        str(tmp_path), train_subsample=128, initial_step=2, leaky_clip=True,
    )
    # all 10 seeds (incl. the test seed) in train; test unchanged
    assert leaky.train.num_trajectories == 10
    assert leaky.test.num_trajectories == 1
    np.testing.assert_array_equal(
        np.asarray(leaky.train.data[9]), np.asarray(leaky.test.data[0])
    )

    clean = load_dr_baseline(str(tmp_path), train_subsample=9, initial_step=2)
    np.testing.assert_array_equal(
        np.asarray(clean.train.data), np.asarray(leaky.train.data[:9])
    )
