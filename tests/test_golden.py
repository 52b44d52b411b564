"""Golden-value regression tests (SURVEY.md section 4, pyramid layer b).

Tiny fixed-seed end-to-end pipelines with stored expected numbers: the
DR solver's field statistics and a short fixed-seed FNO training run.
Guards the whole gen -> load -> train numeric path against silent
regressions.  Tolerances are loose enough for cross-version jax drift
on the CPU backend but far tighter than any real behavior change.

Goldens recorded 2026-08-19 (jax CPU backend).  If a DELIBERATE numeric
change lands (solver, IC law, loss), rerun the printed helpers and
update the constants in the same commit, noting why.
"""

import numpy as np

from sciml_pde_tpu.sim.diff_react import DiffReactConfig, generate_trajectories
from sciml_pde_tpu.sim.gen_diff_react import generate_dataset
from sciml_pde_tpu.train.fno_train import run_training

TINY = dict(xdim=32, ydim=32, tdim=21, t=2.0)

GOLDEN_U_MEAN_F20 = -0.0439047
GOLDEN_U_STD_F20 = 0.5452689
GOLDEN_V_STD_F20 = 0.0677321


def test_dr_solver_field_statistics_golden():
    traj = generate_trajectories([7], DiffReactConfig(**TINY))
    u20, v20 = traj[0, 20, ..., 0], traj[0, 20, ..., 1]
    np.testing.assert_allclose(u20.mean(), GOLDEN_U_MEAN_F20, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(u20.std(), GOLDEN_U_STD_F20, rtol=1e-3)
    np.testing.assert_allclose(v20.std(), GOLDEN_V_STD_F20, rtol=1e-3)


def test_fno_short_training_val_golden(tmp_path):
    """Fixed-seed 2-epoch FNO on 10 fixed-seed DR trajectories: the best
    val nRMSE^2 must stay within 5% of the recorded golden value."""
    generate_dataset(tmp_path / "2D_diff-react_test_all.h5", 10,
                     DiffReactConfig(**TINY), verbose=False)

    res = run_training(
        base_path=str(tmp_path) + "/", dataset_family="dr", if_aux=False,
        train_subsample=(8, 8, 8), modes=4, width=8, initial_step=5,
        rollout_test=1, num_channels=2, batch_size=8, epochs=2, seed=16,
        run_dir=str(tmp_path / "run"), model_name="golden", log_every=1000,
    )
    assert np.isfinite(res.best_val)
    golden = 0.961569  # recorded value; see module docstring
    np.testing.assert_allclose(res.best_val, golden, rtol=0.05)
