"""Autoregressive teacher-forced training + continue_training resume."""

import numpy as np
import pytest

from sciml_pde_tpu.sim.diff_react import DiffReactConfig
from sciml_pde_tpu.sim.gen_diff_react import generate_dataset
from sciml_pde_tpu.train.fno_train import run_training

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dr_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("dr_modes")
    generate_dataset(
        folder / "2D_diff-react_test_all.h5", 8,
        DiffReactConfig(sim_type="all", xdim=12, ydim=12, t=1.0, tdim=11),
        verbose=False,
    )
    return folder


COMMON = dict(
    modes=3, width=8, initial_step=4, rollout_test=1, num_channels=2,
    batch_size=8, learning_rate=1e-3, log_every=1000,
)


def test_autoregressive_training(dr_folder, tmp_path):
    res = run_training(
        base_path=str(dr_folder) + "/", if_aux=False,
        train_subsample=(4, 2, 6), training_type="autoregressive", t_train=8,
        epochs=2, run_dir=str(tmp_path), model_name="t_ar", **COMMON,
    )
    assert np.isfinite(res.best_val)
    # teacher-forced unroll accumulates per-step losses -> larger magnitude
    assert res.history[0]["train_loss"] > 0


def test_continue_training_resumes_epoch(dr_folder, tmp_path):
    kw = dict(
        base_path=str(dr_folder) + "/", if_aux=False, train_subsample=(4, 2, 6),
        run_dir=str(tmp_path), model_name="t_resume", **COMMON,
    )
    r1 = run_training(epochs=2, **kw)
    assert len(r1.history) == 2
    # resume: starts from the checkpointed epoch, only runs the remainder
    r2 = run_training(epochs=4, continue_training=True, **kw)
    assert len(r2.history) <= 4
    assert np.isfinite(r2.best_val)
    assert r2.best_val <= r1.best_val + 1e-6  # best-val only improves
