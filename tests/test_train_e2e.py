"""End-to-end slice: generate tiny DR data -> train FNO (baseline + aux) ->
rollout eval.  Runs on the 8-device CPU mesh; checks learning happens and
every seam (windowing, sharded step, checkpointing, metrics) holds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sciml_pde_tpu.data.windows import WindowedTrajectories, gather_windows, epoch_batches
from sciml_pde_tpu.sim.diff_react import DiffReactConfig
from sciml_pde_tpu.sim.gen_diff_react import generate_dataset
from sciml_pde_tpu.train.fno_train import run_training
from sciml_pde_tpu.train.optim import adaptive_clip, aux_group_of
from sciml_pde_tpu.eval.rollout import evaluate_rollout
from sciml_pde_tpu.models import FNO2d

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dr_data(tmp_path_factory):
    folder = tmp_path_factory.mktemp("dr")
    cfg = dict(xdim=16, ydim=16, t=2.0, tdim=21)
    generate_dataset(
        folder / "2D_diff-react_test_all.h5", 10,
        DiffReactConfig(sim_type="all", **cfg), verbose=False,
    )
    generate_dataset(
        folder / "2D_diff-react_test_diff.h5", 30,
        DiffReactConfig(sim_type="diff", **cfg), verbose=False,
    )
    return folder


def test_gather_windows_semantics():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(3, 10, 4, 4, 2)).astype(np.float32)
    idx = np.array([[1, 2], [0, 0]], np.int32)
    x, y = gather_windows(jnp.asarray(data), jnp.asarray(idx), initial_step=4, rollout=2)
    assert x.shape == (2, 4, 4, 4, 2) and y.shape == (2, 4, 4, 2, 2)
    np.testing.assert_allclose(
        np.asarray(x[0]), np.moveaxis(data[1, 2:6], 0, -2), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(y[1]), np.moveaxis(data[0, 4:6], 0, -2), rtol=1e-6
    )


def test_adaptive_clip_formula():
    tx = adaptive_clip()
    state = tx.init(None)
    # small grad: untouched (norm < 5)
    g = {"w": jnp.ones((3,)) * 0.1}
    out, _ = tx.update(g, state)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-5)
    # huge grad: clipped to 0.1 * norm
    g = {"w": jnp.ones((4,)) * 100.0}  # norm 200
    out, _ = tx.update(g, state)
    norm_after = float(jnp.linalg.norm(out["w"]))
    np.testing.assert_allclose(norm_after, 20.0, rtol=1e-4)
    # medium grad with norm 10 -> clip value max(5, 1)=5
    g = {"w": jnp.ones((4,)) * 5.0}  # norm 10
    out, _ = tx.update(g, state)
    np.testing.assert_allclose(float(jnp.linalg.norm(out["w"])), 5.0, rtol=1e-4)


def test_aux_group_labels():
    assert aux_group_of(("backbone", "conv0", "w1")) == "shared"
    assert aux_group_of(("fc2_primary", "Dense_0", "kernel")) == "primary_head"
    assert aux_group_of(("fc2_auxiliary", "Dense_0", "bias")) == "aux_head"


def test_baseline_training_learns(dr_data, tmp_path):
    res = run_training(
        base_path=str(dr_data) + "/",
        if_aux=False,
        train_subsample=(4, 2, 6),
        modes=4, width=8, initial_step=5, rollout_test=1,
        num_channels=2, batch_size=8, epochs=3,
        learning_rate=2e-3, run_dir=str(tmp_path), model_name="t_base",
        log_every=1000,
    )
    assert len(res.history) == 3
    assert res.history[-1]["val_loss"] < res.history[0]["train_loss"]
    assert np.isfinite(res.best_val)


def test_aux_training_learns_and_evaluates(dr_data, tmp_path):
    res = run_training(
        base_path=str(dr_data) + "/",
        if_aux=True,
        train_subsample=(4, 2, 6),
        num_aux_samples=3, auxiliary_weight=0.7,
        modes=4, width=8, initial_step=5, rollout_test=1,
        num_channels=2, batch_size=8, epochs=3,
        learning_rate_share=2e-3, learning_rate_fc2=2e-3,
        run_dir=str(tmp_path), model_name="t_aux",
        log_every=1000,
    )
    assert res.history[-1]["val_loss"] <= res.history[0]["val_loss"] * 1.5
    assert np.isfinite(res.best_val)

    # rollout eval through the primary head
    from sciml_pde_tpu.data.dr import load_dr_aux
    from sciml_pde_tpu.models import FNO2dAux

    ds = load_dr_aux(str(dr_data) + "/", train_subsample=(4, 2, 6), initial_step=5)
    model = FNO2dAux(num_channels=2, modes1=4, modes2=4, width=8, initial_step=5)

    def apply_fn(x, grid):
        p, _ = model.apply({"params": res.params}, x, grid, x, grid)
        return p

    m = evaluate_rollout(apply_fn, ds.primary_test, rollout_test=2, batch_size=4, iLow=2, iHigh=6)
    assert {"RMSE", "nRMSE", "CSV", "Max", "BD", "F", "mse_time"} <= set(m)
    assert len(m["mse_time"]) == 2
    assert all(np.isfinite(v) for k, v in m.items() if k != "mse_time")
    assert m["nRMSE"] < 2.0
