"""Audit: does the DR inhibitor channel die at frame 10 in reference-style data?

Integrates the same FVM FitzHugh-Nagumo system three ways for a held-out
test seed (the reference's test split = last 10% of keys, i.e. seeds 90+ of
a 100-sample file):

  1. scipy solve_ivp RK45 at the reference's tolerances (solve_ivp defaults
     rtol 1e-3 / atol 1e-6 — ``pdebench/data_gen/src/sim_diff_react.py:127``
     passes no tolerances);
  2. scipy solve_ivp RK45 tight (rtol 1e-6 / atol 1e-9) — ground truth;
  3. this framework's fixed-step RK4 generator (``sim/diff_react.py``).

Reports per-frame channel RMS around the eval window (frames 0..30) so the
"v target RMS at frame 10" question is settled at data level.
"""

from __future__ import annotations

import argparse
import json

import numpy as np
from scipy.integrate import solve_ivp

from sciml_pde_tpu.sim.diff_react import (
    DiffReactConfig,
    generate_trajectories,
    initial_condition,
)


def scipy_traj(seed: int, cfg: DiffReactConfig, rtol: float, atol: float) -> np.ndarray:
    ic = initial_condition(seed, cfg)  # (H, W, 2)
    u0 = np.concatenate([ic[..., 0].ravel(), ic[..., 1].ravel()])
    inv_dx2, inv_dy2 = 1.0 / cfg.dx**2, 1.0 / cfg.dy**2
    n = cfg.xdim * cfg.ydim

    def lap(f):
        f = f.reshape(cfg.ydim, cfg.xdim)
        fp = np.pad(f, 1, mode="edge")
        out = (fp[1:-1, :-2] - 2 * f + fp[1:-1, 2:]) * inv_dx2 + (
            fp[:-2, 1:-1] - 2 * f + fp[2:, 1:-1]
        ) * inv_dy2
        return out.ravel()

    def rhs(t, y):
        u, v = y[:n], y[n:]
        u_t = u - u**3 - cfg.k - v + cfg.Du * lap(u)
        v_t = u - v + cfg.Dv * lap(v)
        return np.concatenate([u_t, v_t])

    sol = solve_ivp(rhs, (0, cfg.t), u0, t_eval=cfg.tgrid, rtol=rtol, atol=atol)
    traj = sol.y.T.reshape(cfg.tdim, 2, cfg.ydim, cfg.xdim)
    return np.moveaxis(traj, 1, -1)  # (T, H, W, 2)


def rms(x):
    return float(np.sqrt(np.mean(np.asarray(x, np.float64) ** 2)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=90)
    p.add_argument("--grid", type=int, default=128)
    p.add_argument("--frames", type=int, nargs="+", default=[0, 5, 10, 15, 20, 30])
    p.add_argument("--skip-tight", action="store_true")
    p.add_argument("--out", default="runs/dr_data_audit.json")
    a = p.parse_args(argv)

    cfg = DiffReactConfig(xdim=a.grid, ydim=a.grid)
    report = {"seed": a.seed, "grid": a.grid, "frames": a.frames}

    ours = np.asarray(generate_trajectories(np.asarray([a.seed]), cfg))[0]
    report["rk4_ours"] = {
        "u_rms": [rms(ours[f, ..., 0]) for f in a.frames],
        "v_rms": [rms(ours[f, ..., 1]) for f in a.frames],
    }
    print("rk4_ours   ", json.dumps(report["rk4_ours"]), flush=True)

    ref = scipy_traj(a.seed, cfg, rtol=1e-3, atol=1e-6)
    report["rk45_ref_tol"] = {
        "u_rms": [rms(ref[f, ..., 0]) for f in a.frames],
        "v_rms": [rms(ref[f, ..., 1]) for f in a.frames],
    }
    d = ref[10] - ours[10]
    report["frame10_rel_l2_ours_vs_reftol"] = rms(d) / rms(ref[10])
    print("rk45_ref   ", json.dumps(report["rk45_ref_tol"]), flush=True)

    if not a.skip_tight:
        tight = scipy_traj(a.seed, cfg, rtol=1e-6, atol=1e-9)
        report["rk45_tight"] = {
            "u_rms": [rms(tight[f, ..., 0]) for f in a.frames],
            "v_rms": [rms(tight[f, ..., 1]) for f in a.frames],
        }
        report["frame10_rel_l2_reftol_vs_tight"] = rms(ref[10] - tight[10]) / rms(
            tight[10]
        )
        report["frame10_rel_l2_ours_vs_tight"] = rms(ours[10] - tight[10]) / rms(
            tight[10]
        )
        print("rk45_tight ", json.dumps(report["rk45_tight"]), flush=True)

    with open(a.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if "rel_l2" in k}, indent=1))


if __name__ == "__main__":
    main()
