"""Production-shape 2D NS experiment: 256^2, 1000 frames, reference physics.

The reference's production NS datasets are 256^2 x 1000-frame trajectories
(4/batch per file), dt 5e-5, frame_int 100, nu 0.05 (`data_gen/configs/
ns_incomp.yaml:10-58`); training follows config_ns (initial_step 10,
batch 16 baseline / 8 aux, 20 epochs, cosine; config_ns.yaml:19,27 —
note the reference aux step is 8 primary + 8*num_aux_samples aux
samples).  This driver generates a basic_dsN-scale
family of those files on device (full-physics primaries + convection-only
aux + test files at index 250+), trains baseline and aux FNO, and runs
the rollout study.

HBM budget: ds2 (2 primary + 6 aux + tests) fits on one v5e chip;
``--host-stream`` switches to the host-RAM streaming pipeline for larger
presets.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from sciml_pde_tpu.sim.gen_ns_incomp import VARIANTS, generate_ns_file
from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig


def make_cfg(grid: int, frames: int, frame_int: int, n_batch: int, variant: str,
             dt: float, nu: float, diffusion_mode: str = "explicit") -> NSIncompConfig:
    kw = dict(VARIANTS[variant])
    nu = kw.pop("nu", nu)
    return NSIncompConfig(
        grid_size=(grid, grid), nu=nu, dt=dt, n_steps=frames * frame_int,
        frame_int=frame_int, n_batch=n_batch, diffusion_mode=diffusion_mode, **kw,
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--folder", default="data/ns_production")
    p.add_argument("--grid", type=int, default=256)
    p.add_argument("--frames", type=int, default=1000)
    p.add_argument("--frame-int", type=int, default=10)
    p.add_argument("--dt", type=float, default=5e-4)
    p.add_argument("--nu", type=float, default=0.05)
    p.add_argument("--diffusion-mode", choices=["explicit", "exact"], default="exact",
                   help="exact (expm propagator) lifts the explicit dt limit: "
                        "dt 5e-4 x frame_int 10 = the reference's 5e-3 frame "
                        "spacing at 1/10th the steps")
    p.add_argument("--n-batch", type=int, default=4)
    p.add_argument("--n-primary", type=int, default=2)
    p.add_argument("--n-primary-aux", type=int, default=0,
                   help="primary files for the AUX variant (0 = same as "
                        "--n-primary); the reference presets halve it "
                        "(config_ns.yaml basic_ds8: [2, 1, 24])")
    p.add_argument("--n-aux-per", type=int, default=3)
    p.add_argument("--aux-grid", type=int, default=0,
                   help="resolution of the generated/stored aux files "
                        "(0 = primary --grid).  A lower-res aux store is "
                        "bilinear-upsampled to the primary grid inside the "
                        "train step (the reference's if_downsample gather, "
                        "utils_2d_ns.py:139-161) — 128 keeps the 24-aux "
                        "reference volume resident in HBM")
    p.add_argument("--aux-chunks", type=int, default=1,
                   help="scan the aux stream in K remat'd chunks per step "
                        "(HLO-temp lever for num_aux_samples 24 = 8+192 "
                        "windows per step)")
    p.add_argument("--aux-compute", choices=["upsample", "native"],
                   default="upsample",
                   help="'upsample' = the reference's gather-time bilinear "
                        "interpolate to the primary grid; 'native' = run "
                        "the aux stream AT the store's resolution (the FNO "
                        "is discretization-invariant) — 4x cheaper aux "
                        "forward at --aux-grid 128")
    p.add_argument("--n-test", type=int, default=1)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = reference per-variant defaults (16 baseline / "
                        "8 aux, config_ns.yaml:19); the round-2 NS table "
                        "was trained at an explicit 2")
    p.add_argument("--host-stream", action="store_true")
    p.add_argument("--aux-store-dtype", default="bf16", choices=["bf16", "f32"],
                   help="device dtype of the aux trajectory store; bf16 keeps "
                        "the 6-file aux set under the chunked-transfer HBM "
                        "ceiling (primary data and all metrics stay fp32)")
    p.add_argument("--primary-store-dtype", default="f32", choices=["bf16", "f32"],
                   help="device dtype of the primary TRAIN store (aux variant "
                        "only); bf16 + --remat fits the reference-batch aux "
                        "step (8 primary + 24 aux windows at 256^2) in HBM")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the 4 spectral blocks on backward")
    p.add_argument("--frames-per-chunk", type=int, default=20,
                   help="frames per jit call during generation (0 = single scan; "
                        "long scans fault some TPU runtimes)")
    p.add_argument("--resident-rotate", type=int, default=0,
                   help="R>1: keep the full train pool in host RAM and "
                        "rotate a 1/R trajectory slice on device per epoch "
                        "(single-chip path to pools beyond HBM; epochs are "
                        "per-slice, so R*N epochs = N full passes)")
    p.add_argument("--rotate-schedule", default="block",
                   choices=["block", "interleave", "cyclic"],
                   help="slice schedule: block = 1 segment/slice (R-1 "
                        "swaps/run, one LR band per slice), interleave = 2 "
                        "half-run passes (2R-1 swaps, both LR bands), "
                        "cyclic = per-epoch (host-OOM hazard)")
    p.add_argument("--skip-gen", action="store_true")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training: restore the best-val checkpoint "
                        "(runs/<out>/ns_prod_<variant><tag>_ckpt) and land "
                        "the rollout table — recovery path when a long "
                        "train item is cut by the queue timeout")
    p.add_argument("--continue-training", action="store_true")
    p.add_argument("--variants", nargs="+", default=["baseline", "aux"],
                   help="baseline | aux | lie (baseline + Lie-point-symmetry "
                        "augmentation, reference fno_lie); 'none' = generate "
                        "the data family and exit (other drivers, e.g. "
                        "ns_transformer, consume the folder)")
    p.add_argument("--tag", default="",
                   help="suffix for model_name/summary keys (e.g. aux-volume "
                        "sweeps over --n-aux-per reusing one data folder)")
    p.add_argument("--out", default="runs/ns_production")
    a = p.parse_args(argv)
    tag = f"_{a.tag}" if a.tag else ""

    folder = Path(a.folder)
    n_primary_aux = a.n_primary_aux or a.n_primary
    aux_grid = a.aux_grid or a.grid
    aux_name = f"ns_aux_2d_{aux_grid}" if aux_grid != a.grid else "ns_aux_2d_256"
    if not a.skip_gen:
        folder.mkdir(parents=True, exist_ok=True)
        cfg = make_cfg(a.grid, a.frames, a.frame_int, a.n_batch, "full", a.dt, a.nu,
                       a.diffusion_mode)
        aux_cfg = make_cfg(aux_grid, a.frames, a.frame_int, a.n_batch, "convection",
                           a.dt, a.nu, a.diffusion_mode)
        t0 = time.time()
        fpc = a.frames_per_chunk
        for i in range(a.n_primary):
            f = folder / f"ns_incom_inhom_2d_256-{i}.h5"
            if not f.exists():
                generate_ns_file(f, i, cfg, frames_per_chunk=fpc)
                print(f"primary {i}: {time.time()-t0:.0f}s total", flush=True)
        for i in range(n_primary_aux * a.n_aux_per):
            f = folder / f"{aux_name}-{i}.h5"
            if not f.exists():
                generate_ns_file(f, 1000 + i, aux_cfg, frames_per_chunk=fpc)
                print(f"aux {i}: {time.time()-t0:.0f}s total", flush=True)
        for i in range(250, 250 + a.n_test):
            f = folder / f"ns_incom_inhom_2d_256-{i}.h5"
            if not f.exists():
                generate_ns_file(f, i, cfg, frames_per_chunk=fpc)
        print(f"generation done: {time.time()-t0:.0f}s", flush=True)

    if a.variants == ["none"]:
        return

    from sciml_pde_tpu.data.ns import load_ns_baseline
    from sciml_pde_tpu.eval.rollout_experiment import rollout_study
    from sciml_pde_tpu.models import FNO2d, FNO2dAux
    from sciml_pde_tpu.train.fno_train import run_training

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    summary_path = out / "summary.json"
    results = json.loads(summary_path.read_text()) if summary_path.exists() else {}
    for variant in a.variants:
        t0 = time.time()
        if a.eval_only:
            from sciml_pde_tpu.utils.checkpoint import restore_params

            class res:  # noqa: N801 - tiny result shim
                params, best_val = restore_params(
                    out / f"ns_prod_{variant}{tag}_ckpt"
                )
            print(f"{variant}: restored ckpt best_val={res.best_val:.6f}",
                  flush=True)
            train_s = 0.0
        else:
            batch = a.batch_size or (8 if variant == "aux" else 16)
            res = run_training(
                base_path=str(folder), aux_path=str(folder), dataset_family="ns",
                if_aux=(variant == "aux"), aux_name=aux_name,
                # 'lie' = baseline FNO + in-step Lie-Trotter augmentation
                # (reference run_forward_ns.sh fno_lie sweep variant,
                # engine fno/transformations.py:17-179)
                lie_augment=(variant == "lie"),
                train_subsample=(a.n_primary, n_primary_aux,
                                 n_primary_aux * a.n_aux_per),
                num_aux_samples=a.n_aux_per, test_range=(250, 250 + a.n_test),
                num_channels=3, modes=12, width=20, initial_step=10,
                batch_size=batch, epochs=a.epochs, host_stream=a.host_stream,
                aux_store_dtype=(None if a.aux_store_dtype == "f32"
                                 else a.aux_store_dtype),
                primary_store_dtype=(None if a.primary_store_dtype == "f32"
                                     else a.primary_store_dtype),
                aux_chunks=a.aux_chunks,
                aux_upsample_at_gather=(aux_grid != a.grid),
                aux_native_compute=(a.aux_compute == "native"),
                fno_remat=a.remat, continue_training=a.continue_training,
                resident_rotate=a.resident_rotate,
                resident_rotate_schedule=a.rotate_schedule,
                run_dir=str(out), model_name=f"ns_prod_{variant}{tag}",
                log_every=500,
            )
            train_s = time.time() - t0
            print(f"{variant}: best_val={res.best_val:.6f} in {train_s:.0f}s",
                  flush=True)

        ds = load_ns_baseline(str(folder), train_subsample=1, initial_step=10,
                              rollout_test=5, test_range=(250, 250 + a.n_test))
        if variant == "aux":
            model = FNO2dAux(num_channels=3, modes1=12, modes2=12, width=20,
                             initial_step=10)

            def apply_fn(pp, x, g):
                o, _ = model.apply({"params": pp}, x, g, x, g)
                return o
        else:
            model = FNO2d(num_channels=3, modes1=12, modes2=12, width=20,
                          initial_step=10)

            def apply_fn(pp, x, g):
                return model.apply({"params": pp}, x, g)

        study = rollout_study(apply_fn, res.params, ds.test, horizons=(1, 2, 3, 4, 5),
                              batch_size=4, out_path=out / f"rollout_{variant}{tag}.json")
        results[variant + tag] = {
            "best_val": float(res.best_val),
            "train_seconds": train_s,
            "rollout_nrmse": [study[k]["nRMSE"] for k in sorted(study)],
            # rotation flags the data-order/LR-band deviation from the
            # reference's global shuffle (ADVICE r3): rotated rows are
            # not directly comparable to non-rotated ones
            "resident_rotate": int(a.resident_rotate),
            "resident_rotate_schedule": (
                a.rotate_schedule if a.resident_rotate else None
            ),
        }
        summary_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
