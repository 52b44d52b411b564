"""OFormer on real (self-generated) PDEBench-format Burgers/Darcy data.

The reference's OFormer comparison suite trains on PDEBench 1D-Burgers
and 2D-Darcy datasets ("OFormer Model Comparison/nn_module/
train_burgers.py", "train_darcy.py").  Those files are not shipped; this
driver generates them with our TPU-native simulators and trains the
ported OFormer on each, recording train/test relative L2.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--out", default="runs/oformer_real")
    p.add_argument("--burgers-n", type=int, default=48)
    p.add_argument("--burgers-nx", type=int, default=256)
    p.add_argument("--darcy-n", type=int, default=192)
    p.add_argument("--darcy-nx", type=int, default=64)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--cases", nargs="+", default=["burgers", "darcy"])
    a = p.parse_args(argv)

    from sciml_pde_tpu.comparisons.oformer_generic import (
        load_pdebench_1d,
        run_oformer_burgers,
        run_oformer_darcy,
    )
    from sciml_pde_tpu.sim.burgers_1d import generate_burgers_file
    from sciml_pde_tpu.sim.darcy_2d import generate_darcy_file, load_pdebench_darcy

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    summary_path = out / "summary.json"
    results = json.loads(summary_path.read_text()) if summary_path.exists() else {}

    if "burgers" in a.cases:
        bpath = Path(a.data) / f"1D_Burgers_Sols_Nu0.01_{a.burgers_nx}.h5"
        if not bpath.exists():
            t0 = time.time()
            generate_burgers_file(bpath, n_samples=a.burgers_n, nx=a.burgers_nx,
                                  n_frames=101, t_final=2.0, seed=7)
            print(f"burgers gen: {time.time()-t0:.0f}s", flush=True)
        data = load_pdebench_1d(bpath)
        n_test = max(len(data) // 8, 1)
        t0 = time.time()
        res = run_oformer_burgers(data[:-n_test], epochs=a.epochs,
                                  run_dir=str(out))
        # held-out eval: next-step rel-L2 on the test trajectories
        from sciml_pde_tpu.comparisons.oformer_generic import eval_oformer_burgers

        test_rel = eval_oformer_burgers(res.params, data[-n_test:])
        results["burgers"] = {
            "train_rel_l2": res.history[-1]["rel_l2"],
            "test_rel_l2": float(test_rel),
            "seconds": time.time() - t0,
        }
        print("burgers:", results["burgers"], flush=True)

    if "darcy" in a.cases:
        dpath = Path(a.data) / f"2D_DarcyFlow_beta1.0_{a.darcy_nx}.h5"
        if not dpath.exists():
            t0 = time.time()
            generate_darcy_file(dpath, n_samples=a.darcy_n, nx=a.darcy_nx, seed=11)
            print(f"darcy gen: {time.time()-t0:.0f}s", flush=True)
        af, uf = load_pdebench_darcy(dpath)
        n_test = max(len(af) // 8, 1)
        t0 = time.time()
        res = run_oformer_darcy(af[:-n_test], uf[:-n_test], epochs=a.epochs,
                                run_dir=str(out))
        from sciml_pde_tpu.comparisons.oformer_generic import eval_oformer_darcy

        test_rel = eval_oformer_darcy(res.params, af[-n_test:], uf[-n_test:],
                                      norm_stats=res.norm_stats)
        results["darcy"] = {
            "train_rel_l2": res.history[-1]["rel_l2"],
            "test_rel_l2": float(test_rel),
            "seconds": time.time() - t0,
        }
        print("darcy:", results["darcy"], flush=True)

    summary_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
