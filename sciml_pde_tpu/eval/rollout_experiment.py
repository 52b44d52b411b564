"""Rollout experiment: train, then score nRMSE at multiple horizons.

Capability parity with the reference's ``Rollout Experiment/`` directory
(baseline/ours twins of the 2D trainers with ``ROLL_TRAIN, ROLL_EVAL = 1,
cfg.rollout_test``): train a model, then evaluate the autoregressive
rollout at horizons 1..K, producing exactly the per-step nRMSE rows that
``Plot Generator/rollout.py`` tabulates.
"""

from __future__ import annotations

import json
from pathlib import Path

from sciml_pde_tpu.eval.rollout import evaluate_rollout


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
    """nRMSE (and the other five metrics) at each rollout horizon."""
    results = {}
    for k in horizons:
        m = evaluate_rollout(
            apply_fn, test_w, rollout_test=k, batch_size=batch_size,
            iLow=iLow, iHigh=iHigh, params=params,
        )
        results[int(k)] = m
        print(f"rollout {k}: nRMSE={m['nRMSE']:.6f}", flush=True)
        if out_path is not None:
            # incremental write: doubles as a liveness heartbeat for
            # stall-detecting babysitters (remote compiles are minutes-long
            # and otherwise file-silent)
            Path(out_path).write_text(json.dumps(results, indent=1))
    return results
