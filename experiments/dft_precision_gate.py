"""Accuracy gate for bf16 spectral contractions (SCIML_DFT_PRECISION).

The round-3 honest profile measured +30% full-step throughput from
``SCIML_DFT_PRECISION=default`` (bf16 matmuls in the partial-DFT chain),
but the default stays exact-f32 until the accuracy cost is measured
end-to-end.  This driver trains the SAME DR preset once per precision
mode (identical seed/budget/data) and compares best-val and the
rollout-1..5 table; the gate PASSES if every rollout-horizon nRMSE
degrades by less than ``--tol`` (relative).

Usage (chip, ~35 min at ds8/100 epochs; CPU-smokeable with tiny dims):
  python experiments/dft_precision_gate.py --data data/ --dataset basic_ds8
  python experiments/dft_precision_gate.py --epochs 2 ... (smoke)
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--dataset", default="basic_ds8")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--modes", type=int, default=None, help="override config")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--tol", type=float, default=0.03,
                   help="max relative nRMSE degradation per horizon")
    p.add_argument("--out", default="runs/dft_precision_gate")
    a = p.parse_args(argv)

    from sciml_pde_tpu.ops.spectral import set_dft_precision
    from sciml_pde_tpu.train.cli import _call_with_supported
    from sciml_pde_tpu.train.fno_train import run_training
    from sciml_pde_tpu.utils.config import load_config
    from sciml_pde_tpu.data.dr import load_dr_baseline
    from sciml_pde_tpu.eval.rollout_experiment import rollout_study
    from sciml_pde_tpu.models import FNO2d

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    results: dict = {}
    for mode in ("highest", "default"):
        set_dft_precision(mode)
        cfg = load_config("config_dr", a.dataset)
        cfg.update(
            base_path=a.data, aux_path=a.data, epochs=a.epochs,
            run_dir=str(out), model_name=f"gate_{mode}", log_every=1000,
        )
        if a.modes:
            cfg["modes"] = a.modes
        if a.width:
            cfg["width"] = a.width
        t0 = time.time()
        res = _call_with_supported(run_training, cfg, if_aux=False)
        train_s = time.time() - t0

        ds = load_dr_baseline(a.data, train_subsample=1,
                              initial_step=cfg["initial_step"], rollout_test=5)
        model = FNO2d(num_channels=cfg.get("num_channels", 2),
                      modes1=cfg["modes"], modes2=cfg["modes"],
                      width=cfg["width"], initial_step=cfg["initial_step"])

        def apply_fn(pp, x, g):
            return model.apply({"params": pp}, x, g)

        study = rollout_study(apply_fn, res.params, ds.test,
                              horizons=(1, 2, 3, 4, 5), batch_size=5,
                              out_path=out / f"rollout_{mode}.json")
        results[mode] = {
            "best_val": float(res.best_val),
            "train_seconds": train_s,
            "rollout_nrmse": [study[k]["nRMSE"] for k in sorted(study)],
        }
        print(mode, json.dumps(results[mode]), flush=True)

    ref = results["highest"]["rollout_nrmse"]
    got = results["default"]["rollout_nrmse"]
    rel = [(g - r) / r for r, g in zip(ref, got)]
    speedup = results["highest"]["train_seconds"] / max(
        results["default"]["train_seconds"], 1e-9
    )
    verdict = "PASS" if max(rel) <= a.tol else "FAIL"
    summary = {
        "highest": results["highest"],
        "default": results["default"],
        "relative_degradation_r1_5": rel,
        "tol": a.tol,
        "train_speedup": speedup,
        "verdict": verdict,
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("highest", "default")}, indent=1))
    print(f"GATE {verdict}: bf16-dft max degradation "
          f"{max(rel)*100:.2f}% (tol {a.tol*100:.0f}%), "
          f"speedup x{speedup:.2f}")


if __name__ == "__main__":
    main()
