"""Quantify DR test-family sampling variance (model-free).

Round-2 verdict left the ds128 parity residual (ours 0.0359 vs published
0.0289 baseline r1) attributed to "data distribution" without a
measurement.  Code reading narrows the candidates:

  - ICs are byte-identical by construction (both sides draw
    ``np.random.default_rng(seed).standard_normal`` — reference
    ``sim_diff_react.py:82-89``, ours ``sim/diff_react.py:76-83``) and the
    solver is validated to rel-L2 5e-6 (``experiments/dr_data_audit.py``),
    so the *training distribution* cannot differ.
  - The reference's loaders clip ``sorted(keys)[:N]`` silently
    (``fno/utils_2d_rd_baseline.py:46-47``, ``fno_aux/utils_2d_rd.py:62-66``).
    With the shipped generation config (``data_gen/configs/diff-react.yaml:20``
    nsample=100) the ds128 preset (train_subsample[0]=128) would put ALL
    100 keys — including the 10 test keys — in the train list: train/test
    leakage.  The ``train_subsample=[900,900,900]`` default instead
    suggests their production file had 1000 seeds (test = seeds 900-999),
    in which case there is no leak but the published table's test family
    differs from the shipped config's (seeds 90-99), and its PRESET is
    not recorded anywhere in the repo.

Either way the remaining lever is *which 10-100 seeds form the test set*.
This script measures that lever model-free: the persistence baseline
(predict frame t+k = last observed frame) is a difficulty functional of
the test trajectories alone, so family-to-family differences in
persistence nRMSE bound how much of the parity residual is test-set
sampling, not model quality.  It reports, per family
(A = seeds 90-99, the shipped-config test family; B = seeds 900-929, the
1000-seed-file hypothesis; C = seeds 500-529, neutral control):

  - persistence nRMSE at horizons 1..5 (same convention as
    ``eval/rollout.py``: error over frames initial_step..initial_step+k-1);
  - the std of 10-trajectory-subset means within the 30-seed families
    (the sampling noise of a 10-trajectory test set).

Usage: python experiments/dr_test_family_audit.py [--out experiments/results]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


FAMILIES = {
    "A_seeds_90_99": list(range(90, 100)),
    "B_seeds_900_929": list(range(900, 930)),
    "C_seeds_500_529": list(range(500, 530)),
}


def persistence_nrmse(traj: np.ndarray, initial_step: int, horizon: int) -> float:
    """nRMSE of predicting frames [initial_step, initial_step+horizon) with
    the last observed frame, per the rollout convention (nRMSE per
    trajectory = ||err|| / ||target|| over space+channels, averaged over
    the horizon and the batch)."""
    last = traj[:, initial_step - 1 : initial_step]  # (B, 1, X, Y, C)
    tgt = traj[:, initial_step : initial_step + horizon]
    err = np.sqrt(np.mean((tgt - last) ** 2, axis=(2, 3, 4)))
    scale = np.sqrt(np.mean(tgt**2, axis=(2, 3, 4)))
    return float(np.mean(err / scale))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--initial-step", type=int, default=10)
    p.add_argument("--out", default="experiments/results")
    p.add_argument("--subset-draws", type=int, default=200)
    a = p.parse_args(argv)

    from sciml_pde_tpu.sim.diff_react import DiffReactConfig, generate_trajectories

    cfg = DiffReactConfig()
    report: dict = {"config": "reference diff-react.yaml defaults", "families": {}}
    rng = np.random.default_rng(0)
    for name, seeds in FAMILIES.items():
        data = np.asarray(generate_trajectories(seeds, cfg))
        row = {
            "seeds": [seeds[0], seeds[-1]],
            "n": len(seeds),
            "persistence_nrmse_r1_5": [
                persistence_nrmse(data, a.initial_step, h) for h in range(1, 6)
            ],
            "field_std": float(data.std()),
            "field_mean_abs": float(np.abs(data).mean()),
        }
        # sampling noise of a 10-trajectory test set within this family
        if len(seeds) > 10:
            per_traj = []
            for i in range(len(seeds)):
                per_traj.append(
                    persistence_nrmse(data[i : i + 1], a.initial_step, 1)
                )
            per_traj = np.asarray(per_traj)
            means = [
                per_traj[rng.choice(len(seeds), 10, replace=False)].mean()
                for _ in range(a.subset_draws)
            ]
            row["r1_subset10_mean_std"] = float(np.std(means))
            row["r1_subset10_rel_spread"] = float(
                np.std(means) / np.mean(per_traj)
            )
        report["families"][name] = row
        print(name, json.dumps(row), flush=True)

    fams = report["families"]
    a_r1 = fams["A_seeds_90_99"]["persistence_nrmse_r1_5"][0]
    b_r1 = fams["B_seeds_900_929"]["persistence_nrmse_r1_5"][0]
    report["family_ratio_A_over_B_r1"] = a_r1 / b_r1
    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "dr_test_family_audit.json").write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items() if k != "families"}))


if __name__ == "__main__":
    main()
