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
