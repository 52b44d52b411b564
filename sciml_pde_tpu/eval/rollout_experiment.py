"""Rollout experiment: train, then score nRMSE at multiple horizons.

Capability parity with the reference's ``Rollout Experiment/`` directory
(baseline/ours twins of the 2D trainers with ``ROLL_TRAIN, ROLL_EVAL = 1,
cfg.rollout_test``): train a model, then evaluate the autoregressive
rollout at horizons 1..K, producing exactly the per-step nRMSE rows that
``Plot Generator/rollout.py`` tabulates.
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.windows import gather_windows
from sciml_pde_tpu.eval.rollout import evaluate_rollout, rollout_predict
from sciml_pde_tpu.metrics import metric_func

_NAMES = ["RMSE", "nRMSE", "CSV", "Max", "BD", "F"]


def rollout_study_fused(
    apply_fn,
    params,
    test_w,
    horizons=(1, 2, 3, 4, 5),
    batch_size: int = 4,
    iLow: int = 4,
    iHigh: int = 12,
    out_path: str | Path | None = None,
) -> dict[int, dict[str, float]]:
    """All horizons from ONE compiled program.

    Rollout predictions are prefix-identical across horizons, and
    horizon-k scoring is the six metrics on step k (``evaluate_rollout``
    semantics), so a single max-horizon rollout with per-step metric_func
    (statically unrolled) replaces len(horizons) separate programs —
    1/len(horizons) the XLA compiles, bit-identical results.
    """
    horizons = sorted(int(k) for k in horizons)
    max_h = horizons[-1]
    idx = test_w.window_index()
    grid = test_w.grid
    initial_step = test_w.initial_step
    # Ship only the frames any window can touch, as a jit ARGUMENT: closing
    # over the full store embeds it as a compile-time constant (a 256^2 x
    # 1000-frame NS test split is >3 GB — past this backend's single-buffer
    # fault line; same fix as evaluate_rollout).
    span = int(idx[:, 1].max()) + initial_step + max_h if len(idx) else 0
    data = jax.device_put(np.asarray(test_w.data[:, :span]))

    @jax.jit
    def batch_metrics(p, batch_idx, data):
        x, y = gather_windows(data, batch_idx, initial_step, max_h)
        gb = jnp.broadcast_to(grid[None], (batch_idx.shape[0],) + grid.shape)
        fn = (lambda a, b: apply_fn(p, a, b)) if params is not None else apply_fn
        preds = rollout_predict(fn, x, gb, max_h)
        vals = [
            metric_func(preds[..., k - 1 : k, :], y[..., k - 1 : k, :],
                        if_mean=True, iLow=iLow, iHigh=iHigh)
            for k in horizons
        ]
        sq = (preds - y) ** 2
        axes = tuple(i for i in range(sq.ndim) if i != sq.ndim - 2)
        return vals, jnp.sqrt(jnp.mean(sq, axis=axes))  # per-step RMSE

    sums = np.zeros((len(horizons), len(_NAMES)))
    mse_time_sum = np.zeros(max_h)
    nb = 0
    for b in range(0, len(idx), batch_size):
        chunk = jnp.asarray(idx[b : b + batch_size])
        per_h, mse_time = batch_metrics(params, chunk, data)
        sums += np.array([[float(v) for v in vals] for vals in per_h])
        mse_time_sum += np.asarray(mse_time)
        nb += 1
    mse_time = (mse_time_sum / nb).tolist()
    results = {
        k: {**dict(zip(_NAMES, sums[i] / nb)), "mse_time": mse_time[:k]}
        for i, k in enumerate(horizons)
    }
    for k in horizons:
        print(f"rollout {k}: nRMSE={results[k]['nRMSE']:.6f}", flush=True)
    if out_path is not None:
        Path(out_path).write_text(json.dumps(results, indent=1))
    return results


def rollout_study(
    apply_fn,
    params,
    test_w,
    horizons=(1, 2, 3, 4, 5),
    batch_size: int = 4,
    iLow: int = 4,
    iHigh: int = 12,
    out_path: str | Path | None = None,
) -> dict[int, dict[str, float]]:
    """nRMSE (and the other five metrics) at each rollout horizon.

    One compiled program for all horizons (see ``rollout_study_fused``);
    the per-horizon loop of separate ``evaluate_rollout`` programs cost
    len(horizons) multi-minute XLA compiles for bit-identical numbers.
    """
    return rollout_study_fused(
        apply_fn, params, test_w, horizons=horizons, batch_size=batch_size,
        iLow=iLow, iHigh=iHigh, out_path=out_path,
    )
