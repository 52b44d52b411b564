"""3D plume end-to-end demo: on-device generation + FNO3d aux training.

Production shapes (res 50x50x89, 150 frames — reference
generate_3D_plume.py defaults) at a reduced trajectory/epoch count; the
config_ns_3d presets are the same code path at full scale.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--folder", default="data/plume3d")
    p.add_argument("--res", type=int, nargs=3, default=[50, 50, 89])
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--substeps", type=int, default=10)
    p.add_argument("--n-primary", type=int, default=2)
    p.add_argument("--n-aux-per", type=int, default=3)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--initial-step", type=int, default=10)
    p.add_argument("--skip-gen", action="store_true")
    p.add_argument("--out", default="runs/plume3d")
    a = p.parse_args(argv)

    from sciml_pde_tpu.sim.ns_plume_3d import Plume3DConfig, generate_plume_files

    folder = Path(a.folder)
    cfg = Plume3DConfig(
        res=tuple(a.res), n_frames=a.frames, substeps=a.substeps,
        out_res=tuple(a.res), out_frames=a.frames,
    )
    aux_cfg = Plume3DConfig(
        res=tuple(a.res), n_frames=a.frames, substeps=a.substeps,
        out_res=tuple(a.res), out_frames=a.frames,
        enable_diffusion=False, enable_buoyancy=False,  # convection form
    )
    if not a.skip_gen:
        t0 = time.time()
        for i in range(a.n_primary):
            generate_plume_files(folder, i, cfg, suffix="_interp")
        for i in range(a.n_primary * a.n_aux_per):
            generate_plume_files(folder, i, aux_cfg, suffix="")
        generate_plume_files(folder, 275, cfg, suffix="_interp")
        print(f"generation: {time.time()-t0:.0f}s", flush=True)

    from sciml_pde_tpu.train.fno_train import run_training

    out = Path(a.out)
    results = {}
    for variant in ["aux"]:
        t0 = time.time()
        res = run_training(
            base_path=str(folder), aux_path=str(folder), dataset_family="ns3d",
            if_aux=True, train_subsample=(a.n_primary, a.n_primary, a.n_primary * a.n_aux_per),
            num_aux_samples=a.n_aux_per, test_range=(275, 276),
            num_channels=4, modes=8, width=20, initial_step=a.initial_step,
            rollout_test=1, batch_size=1, epochs=a.epochs,
            run_dir=str(out), model_name=f"plume_{variant}", log_every=200,
        )
        print(f"{variant}: best_val={res.best_val:.6f} in {time.time()-t0:.0f}s", flush=True)
        results[variant] = {"best_val": float(res.best_val), "history": res.history[-3:]}
        out.mkdir(parents=True, exist_ok=True)
        (out / "summary.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
