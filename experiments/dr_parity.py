"""2D diffusion-reaction parity experiment: baseline vs aux FNO.

Trains both models at a basic_dsN preset on freshly generated data and
evaluates rollout nRMSE at horizons 1..5 — the numbers to compare against
the paper's table (plots/paper_tables.ROLLOUT_NRMSE['2D_DR']['FNO']):
  baseline: 0.028906 / 0.033876 / 0.045756 / 0.059498 / 0.073865
  aux:      0.023155 / 0.02904  / 0.040126 / 0.053151 / 0.066781
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from sciml_pde_tpu.eval.rollout_experiment import rollout_study
from sciml_pde_tpu.train.fno_train import run_training
from sciml_pde_tpu.utils.config import load_config


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--dataset", default="basic_ds8")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--out", default="runs/dr_parity")
    p.add_argument("--variants", nargs="+", default=["baseline", "aux"])
    p.add_argument("--continue-training", action="store_true",
                   help="resume from the run_dir checkpoint (tunnel-wedge recovery)")
    p.add_argument("--host-stream", action="store_true",
                   help="keep trajectory stores in host RAM (ds256: the "
                        "256-primary store is 3.4 GB and the 384-aux store "
                        "5.1 GB — past the ~3 GB device-buffer fault line)")
    p.add_argument("--seed", type=int, default=None,
                   help="training seed; the reference sweeps {16, 99, 17} "
                        "(run_forward_rd.sh) and its published table may be "
                        "a seed aggregate — vary this to measure the spread")
    p.add_argument("--fast-step", action="store_true",
                   help="fused-Pallas trainer path for the baseline variant "
                        "(train/fast_step.py; aux keeps the XLA step)")
    p.add_argument("--leaky-clip", action="store_true",
                   help="AUDIT ONLY: replicate the reference baseline "
                        "loader's sorted(keys)[:N] train list, which on a "
                        "100-seed file at ds128 includes the 10 test seeds "
                        "(fno/utils_2d_rd_baseline.py:46-47); quantifies "
                        "what that leak is worth on the published numbers. "
                        "Summary keys get a _leak suffix.")
    a = p.parse_args(argv)
    if a.leaky_clip and a.variants != ["baseline"]:
        # the leak replication exists only for the baseline loader (the
        # reference aux loader's primary stream [:64] does not leak at
        # ds128); an aux run would train on the CLEAN split yet land
        # under an aux_leak key — refuse rather than mislabel
        p.error("--leaky-clip requires --variants baseline")

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    summary_path = out / "summary.json"
    results = json.loads(summary_path.read_text()) if summary_path.exists() else {}
    for variant in a.variants:
        cfg = load_config("config_dr", a.dataset)
        suffix = f"_s{a.seed}" if a.seed is not None else ""
        if a.leaky_clip:
            suffix += "_leak"
        cfg.update(
            base_path=a.data, aux_path=a.data, epochs=a.epochs,
            run_dir=str(out), model_name=f"dr_{a.dataset}_{variant}{suffix}",
            log_every=500, continue_training=a.continue_training,
            host_stream=a.host_stream, dr_leaky_clip=a.leaky_clip,
        )
        if a.seed is not None:
            cfg["seed"] = a.seed
        if a.fast_step and variant == "baseline":
            cfg["fast_step"] = True
        primary_n = cfg["train_subsample"][0 if variant == "baseline" else 1]
        if primary_n > 90 and not a.leaky_clip:
            # the primary file holds 90 train seeds; ds128+ extends the
            # train pool with the seeds-100..299 extension file
            cfg["extra_train_files"] = ["2D_diff-react_ext_all_100_299.h5"]
        t0 = time.time()
        if variant == "aux":
            cfg["batch_size"] = 2  # reference config_dr.yaml:20 (2 for AUX)
        from sciml_pde_tpu.train.cli import _call_with_supported

        res = _call_with_supported(
            run_training, cfg, if_aux=(variant == "aux"),
        )
        train_s = time.time() - t0
        print(f"{variant}: best_val={res.best_val:.6f} in {train_s:.0f}s", flush=True)

        # rollout study with the final params (cosine schedule decays the LR
        # to zero, so the final epoch is at/near the best-val checkpoint)
        from sciml_pde_tpu.data.dr import load_dr_baseline
        from sciml_pde_tpu.models import FNO2d, FNO2dAux

        ds = load_dr_baseline(a.data, train_subsample=1, initial_step=10, rollout_test=5)
        if variant == "aux":
            model = FNO2dAux(num_channels=2, modes1=12, modes2=12, width=20, initial_step=10)

            def apply_fn(pp, x, g):
                o, _ = model.apply({"params": pp}, x, g, x, g)
                return o
        else:
            model = FNO2d(num_channels=2, modes1=12, modes2=12, width=20, initial_step=10)

            def apply_fn(pp, x, g):
                return model.apply({"params": pp}, x, g)

        study = rollout_study(
            apply_fn, res.params, ds.test, horizons=(1, 2, 3, 4, 5),
            batch_size=5, out_path=out / f"rollout_{a.dataset}_{variant}{suffix}.json",
        )
        results[variant + suffix] = {
            "best_val": float(res.best_val),
            "train_seconds": train_s,
            "rollout_nrmse": [study[k]["nRMSE"] for k in sorted(study)],
        }
        (out / "summary.json").write_text(json.dumps(results, indent=1))

    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
