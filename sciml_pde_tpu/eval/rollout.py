"""Autoregressive rollout evaluation as a single compiled scan.

Replaces the reference's python feed-back loop (metrics.py:337-344):

    for _t in range(rollout_test):
        pred = model(xx, grid)
        xx = torch.cat((xx[..., 1:, :], pred), dim=-2)

with ``lax.scan`` over a fixed-shape carry (the sliding window), evaluated
per test batch; the final-step prediction is scored against the final target
frame with the six PDEBench metrics, averaged over batches.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.metrics import metric_func
from sciml_pde_tpu.data.windows import gather_windows, WindowedTrajectories


def rollout_predict(
    apply_fn: Callable, x0: jnp.ndarray, grid: jnp.ndarray, steps: int
) -> jnp.ndarray:
    """Roll the one-step operator ``steps`` times feeding predictions back.

    apply_fn(x, grid) -> (B, *spatial, 1, C).
    Returns all predictions stacked on the time axis: (B, *spatial, steps, C).
    """

    def body(xx, _):
        pred = apply_fn(xx, grid)
        xx = jnp.concatenate([xx[..., 1:, :], pred], axis=-2)
        return xx, pred

    _, preds = jax.lax.scan(body, x0, None, length=steps)
    # preds: (steps, B, *spatial, 1, C) -> (B, *spatial, steps, C)
    preds = jnp.squeeze(preds, axis=-2)
    return jnp.moveaxis(preds, 0, -2)


def convention_table(
    apply_fn: Callable,
    test: WindowedTrajectories,
    rollout_test: int,
    params=None,
    batch_size: int = 8,
) -> dict[str, list[float]]:
    """Rollout-k nRMSE under all four published metric conventions.

    The published FNO tables score metric_func (per-channel-normalized)
    on the FINAL unrolled step (metrics.py:337-343); the published
    transformer tables score nRMSE normalized JOINTLY over (C,spatial)
    on ALL unrolled frames (train_transformer_rd.py:64-70 normalization
    + Baseline_rollout/metrics.py:186-196 frame stacking — established
    by experiments/dr_convention_eval.py, where the joint/all row lands
    on the published DR transformer table).  Returns
    ``{joint_final, joint_all, perch_final, perch_all}`` -> list over
    rollout horizons 1..rollout_test, averaged over all test windows.
    """
    idx = test.window_index()
    initial_step = test.initial_step
    grid = test.grid
    span = int(idx[:, 1].max()) + initial_step + rollout_test if len(idx) else 0
    data = jax.device_put(np.asarray(test.data[:, :span]))

    @jax.jit
    def batch_rows(p, batch_idx, data):
        x, y = gather_windows(data, batch_idx, initial_step, rollout_test)
        gb = jnp.broadcast_to(grid[None], (batch_idx.shape[0],) + grid.shape)
        fn = apply_fn if params is None else (lambda a, b: apply_fn(p, a, b))
        preds = rollout_predict(fn, x, gb, rollout_test)  # (B,*sp,R,C)
        sp = tuple(range(1, preds.ndim - 2))  # spatial axes

        def joint(pred, tgt, axes):
            mse = jnp.mean((pred - tgt) ** 2, axis=axes)
            den = jnp.mean(tgt**2, axis=axes) + 1e-7
            return jnp.mean(jnp.sqrt(mse) / jnp.sqrt(den))

        def perch(pred, tgt, axes):
            rmse = jnp.sqrt(jnp.mean((pred - tgt) ** 2, axis=axes))
            den = jnp.sqrt(jnp.mean(tgt**2, axis=axes)) + 1e-7
            return jnp.mean(rmse / den)

        rows = {k: [] for k in ("joint_final", "joint_all", "perch_final", "perch_all")}
        for k in range(rollout_test):
            pf, tf = preds[..., k, :], y[..., k, :]
            pa, ta = preds[..., : k + 1, :], y[..., : k + 1, :]
            rows["joint_final"].append(joint(pf, tf, sp + (preds.ndim - 2,)))
            rows["perch_final"].append(perch(pf, tf, sp))
            # all-steps: the time axis folds into the reduction
            rows["joint_all"].append(joint(pa, ta, sp + (preds.ndim - 2, preds.ndim - 1)))
            rows["perch_all"].append(perch(pa, ta, sp + (preds.ndim - 2,)))
        return {k: jnp.stack(v) for k, v in rows.items()}

    sums = {k: np.zeros(rollout_test) for k in ("joint_final", "joint_all", "perch_final", "perch_all")}
    nb = 0
    for b in range(0, len(idx), batch_size):
        rows = batch_rows(params, jnp.asarray(idx[b : b + batch_size]), data)
        for k, v in rows.items():
            sums[k] += np.asarray(v)
        nb += 1
    return {k: (v / max(nb, 1)).tolist() for k, v in sums.items()}


def evaluate_rollout(
    apply_fn: Callable,
    test: WindowedTrajectories,
    rollout_test: int,
    batch_size: int = 8,
    iLow: int = 4,
    iHigh: int = 12,
    params=None,
    score: str = "final",
) -> dict[str, float]:
    """Rollout eval over the test split: six metrics on the final step.

    Matches reference ``metrics(..., val_type='rollout')``: seed with the
    first ``initial_step`` frames, unroll ``rollout_test`` steps, score the
    final prediction against the final target frame.  (The reference divides
    accumulated sums by the last batch *index*; we divide by the batch
    count.)

    ``score``: the FNO reference scores only the FINAL unrolled step
    against the final target frame (metrics.py:337-343, ``yy[...,-1:,:]``)
    — the default.  The *transformer* rollout evaluators instead score the
    metric over ALL unrolled frames (Transformer_2D_DR/Baseline_rollout/
    metrics.py:186-196: ``pred_stack`` of R frames into metric_func, which
    means over the T axis) — pass ``score="all_steps"`` to compare against
    the published transformer tables.

    If ``params`` is given, ``apply_fn(params, x, grid)`` is used and params
    are passed as a jit argument (closing over device arrays would embed
    them as compile-time constants — slow, and a host transfer some TPU
    backends reject).
    """
    idx = test.window_index()
    n = len(idx)
    grid = test.grid
    initial_step = test.initial_step
    # Keep only the frames any window can touch, and ship the store as a
    # jit ARGUMENT: closing over it would embed the whole test tensor as a
    # compile-time constant (a 4-trajectory 50x50x89x150x4 3D test split is
    # 2.1 GB — large enough to fault this backend's worker at transfer).
    span = int(idx[:, 1].max()) + initial_step + rollout_test if n else 0
    data = jax.device_put(np.asarray(test.data[:, :span]))

    @partial(jax.jit, static_argnames=())
    def batch_metrics(p, batch_idx, data):
        x, y = gather_windows(data, batch_idx, initial_step, rollout_test)
        gb = jnp.broadcast_to(grid[None], (batch_idx.shape[0],) + grid.shape)
        fn = apply_fn if params is None else (lambda a, b: apply_fn(p, a, b))
        preds = rollout_predict(fn, x, gb, rollout_test)
        if score == "all_steps":
            final_pred, final_tar = preds, y
        else:
            final_pred = preds[..., -1:, :]
            final_tar = y[..., -1:, :]
        # per-unrolled-step RMSE (the reference's val_l2_time / mse_time.npz,
        # metrics.py:384-389,520-525)
        sq = (preds - y) ** 2
        axes = tuple(i for i in range(sq.ndim) if i != sq.ndim - 2)
        mse_time = jnp.sqrt(jnp.mean(sq, axis=axes))
        return (
            metric_func(final_pred, final_tar, if_mean=True, iLow=iLow, iHigh=iHigh),
            mse_time,
        )

    names = ["RMSE", "nRMSE", "CSV", "Max", "BD", "F"]
    sums = np.zeros(len(names))
    mse_time_sum = np.zeros(rollout_test)
    nb = 0
    for b in range(0, n, batch_size):
        chunk = idx[b : b + batch_size]  # last chunk may be ragged (one extra compile)
        vals, mse_time = batch_metrics(params, jnp.asarray(chunk), data)
        sums += np.array([float(v) for v in vals])
        mse_time_sum += np.asarray(mse_time)
        nb += 1
    out = {k: v / nb for k, v in zip(names, sums)}
    out["mse_time"] = (mse_time_sum / nb).tolist()
    return out
