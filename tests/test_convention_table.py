"""convention_table: the four published nRMSE conventions in one pass.

Oracle: a plain-numpy re-implementation of each convention on a tiny
identity-like operator, plus consistency with evaluate_rollout's
metric_func nRMSE (perch_final must match it — same definition).
"""

import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.windows import WindowedTrajectories
from sciml_pde_tpu.eval.rollout import convention_table, evaluate_rollout


def _setup(seed=0, n=3, t=12, hw=6, c=2, initial_step=4):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(n, t, hw, hw, c)).astype(np.float32)
    grid = rng.normal(size=(hw, hw, 2)).astype(np.float32)
    test = WindowedTrajectories(
        data=jnp.asarray(data), grid=jnp.asarray(grid),
        initial_step=initial_step, rollout=3,
    )
    return data, test


def _shift_op(params, x, grid):
    # "prediction" = last input frame (persistence operator): deterministic,
    # shape-correct, and easy to reproduce in numpy
    return x[..., -1:, :]


def test_perch_final_matches_metric_func_nrmse():
    data, test = _setup()
    rollout = 3
    table = convention_table(_shift_op, test, rollout, params={}, batch_size=2)
    m = evaluate_rollout(_shift_op, test, rollout_test=rollout, batch_size=2,
                         params={})
    assert np.isclose(table["perch_final"][-1], m["nRMSE"], rtol=1e-5), (
        table["perch_final"], m["nRMSE"])


def test_joint_all_numpy_oracle():
    data, test = _setup()
    rollout = 3
    initial_step = test.initial_step
    # one batch spanning every window: the table averages per-batch means
    # (reference metrics() semantics), which only equals the global mean
    # when batches are uniform
    table = convention_table(_shift_op, test, rollout, params={}, batch_size=256)

    # numpy oracle: persistence prediction is frame initial_step-1 forever
    idx = np.asarray(test.window_index())
    preds, tgts = [], []
    for traj, t0 in idx:
        last = data[traj, t0 + initial_step - 1]
        preds.append(np.stack([last] * rollout, axis=-2))  # (H,W,R,C)
        tgts.append(np.moveaxis(
            data[traj, t0 + initial_step : t0 + initial_step + rollout],
            0, -2))
    preds, tgts = np.stack(preds), np.stack(tgts)
    for k in range(rollout):
        pa = preds[..., : k + 1, :]
        ta = tgts[..., : k + 1, :]
        mse = np.mean((pa - ta) ** 2, axis=(1, 2, 3, 4))
        den = np.mean(ta**2, axis=(1, 2, 3, 4)) + 1e-7
        oracle = float(np.mean(np.sqrt(mse) / np.sqrt(den)))
        assert np.isclose(table["joint_all"][k], oracle, rtol=1e-5), (
            k, table["joint_all"][k], oracle)


def test_all_steps_prefix_consistency():
    """joint_all at k=1 equals joint_final at k=1 (single frame)."""
    _, test = _setup(seed=3)
    table = convention_table(_shift_op, test, 2, params={}, batch_size=4)
    assert np.isclose(table["joint_all"][0], table["joint_final"][0], rtol=1e-6)
    assert np.isclose(table["perch_all"][0], table["perch_final"][0], rtol=1e-6)
