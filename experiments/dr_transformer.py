"""2D DR transformer (VideoMAE operator): baseline vs aux, any scale.

The reference's Transformer_2D_DR experiments use in_chans 2, img 128,
tubelet 1, encoder 1024x16 heads, 60 epochs, fp16 AMP
(Ours/config_transformer_aux_rd.yaml:39-53).  Defaults here are a
mid-size smoke configuration; the full-size study (and the
aux-instability experiment matrix {precision} x {aux_weight} x
{warmup}) is driven through the flags, e.g.

  python experiments/dr_transformer.py --dataset basic_ds8 --epochs 60 \
      --encoder-dim 1024 --encoder-depth 12 --encoder-heads 16 \
      --decoder-dim 512 --decoder-depth 8 --batch-size 2 --grad-accum 2 \
      --aux-weight 0.5 --warmup-frac 0.05 --precision bf16
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--dataset", default="basic_ds8")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--encoder-dim", type=int, default=384)
    p.add_argument("--encoder-depth", type=int, default=6)
    p.add_argument("--encoder-heads", type=int, default=8)
    p.add_argument("--decoder-dim", type=int, default=256)
    p.add_argument("--decoder-depth", type=int, default=4)
    p.add_argument("--decoder-heads", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--aux-weight", type=float, default=0.5)
    p.add_argument("--warmup-frac", type=float, default=0.05)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--drop-path", type=float, default=0.0,
                   help="reference full-size config uses 0.10")
    p.add_argument("--loss", choices=["nrmse2", "nrmse", "nrmse_perchannel"], default="nrmse",
                   help="the reference DR trainers use true nRMSE (sqrt)")
    p.add_argument("--fourier-weight", type=float, default=0.1,
                   help="relative-FFT-L2 loss weight (published DR recipe: 0.1)")
    p.add_argument("--clip", type=float, default=1.0,
                   help="grad-norm clip (published DR rollout recipe: 1.0)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder blocks (HBM for FLOPs)")
    p.add_argument("--seed", type=int, default=16)
    p.add_argument("--tag", default="", help="suffix for model_name/summary keys")
    p.add_argument("--continue-training", action="store_true",
                   help="resume from the run_dir checkpoint (tunnel-wedge recovery)")
    p.add_argument("--eval-only", action="store_true",
                   help="skip training; restore the best-val checkpoint and run the rollout study")
    p.add_argument("--out", default="runs/dr_transformer")
    p.add_argument("--variants", nargs="+", default=["baseline", "aux"])
    p.add_argument("--swa-frac", type=float, default=0.1,
                   help="weight-average window as a fraction of epochs "
                        "(reference aux recipe: last 10%%)")
    p.add_argument("--early-boost", type=float, default=0.0,
                   help="over-sample t0<=12 windows with weight 1+boost "
                        "(v-channel coverage fix; 0 = uniform, the reference)")
    a = p.parse_args(argv)

    from sciml_pde_tpu.train.transformer_train import run_transformer_training
    from sciml_pde_tpu.eval.rollout import evaluate_rollout
    from sciml_pde_tpu.data.dr import load_dr_baseline
    from sciml_pde_tpu.models.transformer import VideoMAEOperator, VideoMAEOperatorAux
    from sciml_pde_tpu.utils.config import load_config

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    train_subsample = load_config("config_dr", a.dataset)["train_subsample"]
    # reference hyperparameters (config_transformer_aux_rd.yaml): lr 3e-4,
    # 5% warmup, aux weight 0.5
    # optimizer steps (optax.MultiSteps ticks schedules once per
    # accumulated update), so warmup_frac is a true fraction
    steps_per_epoch = max(train_subsample[0] * 91 // a.batch_size // max(a.grad_accum, 1), 1)
    kw = dict(
        img_size=128, patch_size=16, tubelet_size=1, in_chans=2,
        encoder_embed_dim=a.encoder_dim, encoder_depth=a.encoder_depth,
        encoder_num_heads=a.encoder_heads,
        decoder_embed_dim=a.decoder_dim, decoder_depth=a.decoder_depth,
        decoder_num_heads=a.decoder_heads,
        initial_step=10, batch_size=a.batch_size, epochs=a.epochs,
        grad_accum=a.grad_accum, bf16=(a.precision == "bf16"),
        drop_path_rate=a.drop_path,
        learning_rate_share=a.lr, learning_rate_heads=a.lr,
        warmup_steps=max(int(a.warmup_frac * a.epochs * steps_per_epoch), 1),
        auxiliary_weight=a.aux_weight,
        seed=a.seed,
        continue_training=a.continue_training,
        loss_type=a.loss,
        fourier_weight=a.fourier_weight,
        clip=a.clip,
        use_checkpoint=a.remat,
        early_window_boost=a.early_boost,
    )
    summary_path = out / "summary.json"
    results = json.loads(summary_path.read_text()) if summary_path.exists() else {}
    for variant in a.variants:
        key = f"{a.dataset}_{variant}{('_' + a.tag) if a.tag else ''}"
        t0 = time.time()
        if a.eval_only:
            from sciml_pde_tpu.utils.checkpoint import restore_params

            params, best_val = restore_params(out / f"vmae_dr_{key}_ckpt")
            res = None
            train_s = 0.0
            print(f"{key}: restored ckpt best_val={best_val:.6f}", flush=True)
        else:
            vkw = dict(kw)
            if variant == "aux":
                # reference DR aux (train_transformer_aux_rd.py): shared
                # decoder output (no separate heads), plain nrmse without
                # the fft term, SWA over the last 10% of epochs
                vkw.update(aux_shared_head=True, fourier_weight=0.0,
                           swa_frac=a.swa_frac)
            res = run_transformer_training(
                base_path=a.data, aux_path=a.data, dataset_family="dr",
                if_aux=(variant == "aux"), train_subsample=tuple(train_subsample),
                num_aux_samples=3, run_dir=str(out),
                model_name=f"vmae_dr_{key}", log_every=500, **vkw,
            )
            # evaluate the BEST-val checkpoint, not the final params — aux
            # training can destabilize late (RESULTS.md) and the cosine
            # end-state is then far off the best
            from sciml_pde_tpu.utils.checkpoint import restore_params

            try:
                params, best_val = restore_params(out / f"vmae_dr_{key}_ckpt")
            except Exception:
                params, best_val = res.params, res.best_val
            train_s = time.time() - t0
            print(f"{key}: best_val={res.best_val:.6f} in {train_s:.0f}s", flush=True)

        ds = load_dr_baseline(a.data, train_subsample=1, initial_step=10, rollout_test=5)
        mk = dict(
            img_size=128, patch_size=16, tubelet_size=1, in_chans=2,
            num_frames=10, encoder_dim=a.encoder_dim, encoder_depth=a.encoder_depth,
            encoder_heads=a.encoder_heads, decoder_dim=a.decoder_dim,
            decoder_depth=a.decoder_depth, decoder_heads=a.decoder_heads,
            dtype=jnp.bfloat16 if a.precision == "bf16" else jnp.float32,
        )
        if variant == "aux":
            model = VideoMAEOperatorAux(**mk, shared_head=True)

            def apply_fn(pp, x, g):
                xt = jnp.moveaxis(x, -2, 1)
                o, _ = model.apply({"params": pp}, xt, xt)
                return o[..., None, :]
        else:
            model = VideoMAEOperator(**mk)

            def apply_fn(pp, x, g):
                xt = jnp.moveaxis(x, -2, 1)
                return model.apply({"params": pp}, xt)[..., None, :]

        study = {}
        for k in (1, 2, 3, 4, 5):
            m = evaluate_rollout(apply_fn, ds.test, rollout_test=k, batch_size=5,
                                 params=params)
            study[k] = m["nRMSE"]
            print(f"rollout {k}: nRMSE={m['nRMSE']:.6f}", flush=True)
        swa_study = None
        if res is not None and res.swa_params is not None:
            swa_study = []
            for k in (1, 2, 3, 4, 5):
                m = evaluate_rollout(apply_fn, ds.test, rollout_test=k,
                                     batch_size=5, params=res.swa_params)
                swa_study.append(m["nRMSE"])
                print(f"SWA rollout {k}: nRMSE={m['nRMSE']:.6f}", flush=True)
        # the published transformer tables score the metric over ALL
        # unrolled frames (Baseline_rollout/metrics.py:186-196); since
        # autoregressive unrolls are prefix-consistent, that convention is
        # the cumulative mean of our final-step-per-horizon numbers
        final_seq = [study[k] for k in sorted(study)]
        cum_mean = [float(np.mean(final_seq[: i + 1])) for i in range(len(final_seq))]
        results[key] = {
            "best_val": float(best_val),
            "train_seconds": train_s,
            "val_history": [h.get("val_loss") for h in res.history] if res else None,
            "rollout_nrmse": final_seq,
            "rollout_nrmse_allsteps": cum_mean,
            "swa_rollout_nrmse": swa_study,
        }
        summary_path.write_text(json.dumps(results, indent=1))
    print(json.dumps({k: results[k] for k in results}, indent=1), flush=True)


if __name__ == "__main__":
    main()
