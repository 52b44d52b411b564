"""End-to-end 2D NS demonstration at reduced scale.

Generates a small NS dataset family ON DEVICE (primary + convection-only
aux + test files), then trains the aux FNO and the aux transformer and
evaluates rollout nRMSE — the full 2D-NS pipeline of the reference
(gen_ns_incomp -> FNODatasetMult -> fno_aux / Transformer_2D_NS) at a scale
that fits one chip's hour budget.  The production-scale run is identical
code with the config_ns presets (256^2, 1000 frames, files 0..N/250..274).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from sciml_pde_tpu.sim.gen_ns_incomp import VARIANTS, generate_ns_file
from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig


def generate(folder: Path, grid: int, frames: int, frame_int: int, n_primary: int,
             n_aux_per: int, n_test: int, test_start: int = 250):
    cfg = NSIncompConfig(
        grid_size=(grid, grid), nu=0.05, dt=5e-4, n_steps=frames * frame_int,
        frame_int=frame_int, n_batch=2, cg_tol=1e-3, cg_max_iter=300,
    )
    aux_cfg = NSIncompConfig(
        grid_size=(grid, grid), nu=0.05, dt=5e-4, n_steps=frames * frame_int,
        frame_int=frame_int, n_batch=2, cg_tol=1e-3, cg_max_iter=300,
        **VARIANTS["convection"],
    )
    folder.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    for i in range(n_primary):
        generate_ns_file(folder / f"ns_incom_inhom_2d_256-{i}.h5", i, cfg)
    for i in range(n_primary * n_aux_per):
        generate_ns_file(folder / f"ns_aux_2d_256-{i}.h5", 1000 + i, aux_cfg)
    for i in range(test_start, test_start + n_test):
        generate_ns_file(folder / f"ns_incom_inhom_2d_256-{i}.h5", i, cfg)
        generate_ns_file(folder / f"ns_aux_2d_256-{i}.h5", 2000 + i, aux_cfg)
    print(f"generation: {time.time()-t0:.0f}s", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--folder", default="data/ns_demo")
    p.add_argument("--grid", type=int, default=128)
    p.add_argument("--frames", type=int, default=101)
    p.add_argument("--frame-int", type=int, default=20)
    p.add_argument("--n-primary", type=int, default=2)
    p.add_argument("--n-aux-per", type=int, default=3)
    p.add_argument("--n-test", type=int, default=2)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--skip-gen", action="store_true")
    p.add_argument("--out", default="runs/ns_demo")
    a = p.parse_args(argv)

    folder = Path(a.folder)
    if not a.skip_gen:
        generate(folder, a.grid, a.frames, a.frame_int, a.n_primary, a.n_aux_per, a.n_test)

    from sciml_pde_tpu.train.fno_train import run_training
    from sciml_pde_tpu.eval.rollout_experiment import rollout_study
    from sciml_pde_tpu.data.ns import load_ns_baseline
    from sciml_pde_tpu.models import FNO2d, FNO2dAux

    out = Path(a.out)
    results = {}
    for variant in ["baseline", "aux"]:
        t0 = time.time()
        res = run_training(
            base_path=str(folder), aux_path=str(folder), dataset_family="ns",
            if_aux=(variant == "aux"), train_subsample=(a.n_primary, a.n_primary, a.n_primary * a.n_aux_per),
            num_aux_samples=a.n_aux_per, test_range=(250, 250 + a.n_test),
            num_channels=3, modes=12, width=20, initial_step=10,
            batch_size=4 if variant == "baseline" else 2, epochs=a.epochs,
            run_dir=str(out), model_name=f"ns_{variant}", log_every=500,
        )
        print(f"{variant}: best_val={res.best_val:.6f} in {time.time()-t0:.0f}s", flush=True)

        ds = load_ns_baseline(str(folder), train_subsample=1, initial_step=10,
                              rollout_test=5, test_range=(250, 250 + a.n_test))
        if variant == "aux":
            model = FNO2dAux(num_channels=3, modes1=12, modes2=12, width=20, initial_step=10)

            def apply_fn(pp, x, g):
                o, _ = model.apply({"params": pp}, x, g, x, g)
                return o
        else:
            model = FNO2d(num_channels=3, modes1=12, modes2=12, width=20, initial_step=10)

            def apply_fn(pp, x, g):
                return model.apply({"params": pp}, x, g)

        study = rollout_study(apply_fn, res.params, ds.test, horizons=(1, 2, 3, 4, 5),
                              batch_size=4, out_path=out / f"rollout_ns_{variant}.json")
        results[variant] = {
            "best_val": float(res.best_val),
            "rollout_nrmse": [study[k]["nRMSE"] for k in sorted(study)],
        }
        (out / "summary.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
