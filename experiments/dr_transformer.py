"""2D DR transformer (VideoMAE operator) demo: baseline vs aux.

The reference's Transformer_2D_DR experiments use in_chans 2, img 128,
tubelet 1 (config_transformer_aux_rd.yaml:39-53).  This runs a mid-size
configuration end to end on the generated DR data and records rollout
nRMSE for both variants.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--encoder-dim", type=int, default=384)
    p.add_argument("--encoder-depth", type=int, default=6)
    p.add_argument("--decoder-dim", type=int, default=256)
    p.add_argument("--decoder-depth", type=int, default=4)
    p.add_argument("--out", default="runs/dr_transformer")
    p.add_argument("--variants", nargs="+", default=["baseline", "aux"])
    a = p.parse_args(argv)

    from sciml_pde_tpu.train.transformer_train import run_transformer_training
    from sciml_pde_tpu.eval.rollout import evaluate_rollout
    from sciml_pde_tpu.data.dr import load_dr_baseline
    from sciml_pde_tpu.models.transformer import VideoMAEOperator, VideoMAEOperatorAux

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    # reference hyperparameters (config_transformer_aux_rd.yaml): lr 3e-4,
    # 5% warmup, aux weight 0.5
    steps_per_epoch = 8 * 91 // 4
    kw = dict(
        img_size=128, patch_size=16, tubelet_size=1, in_chans=2,
        encoder_embed_dim=a.encoder_dim, encoder_depth=a.encoder_depth,
        encoder_num_heads=8,
        decoder_embed_dim=a.decoder_dim, decoder_depth=a.decoder_depth,
        decoder_num_heads=8,
        initial_step=10, batch_size=4, epochs=a.epochs,
        learning_rate_share=3e-4, learning_rate_heads=3e-4,
        warmup_steps=max(int(0.05 * a.epochs * steps_per_epoch), 1),
        auxiliary_weight=0.5,
    )
    results = {}
    for variant in a.variants:
        t0 = time.time()
        res = run_transformer_training(
            base_path=a.data, aux_path=a.data, dataset_family="dr",
            if_aux=(variant == "aux"), train_subsample=(8, 4, 12),
            num_aux_samples=3, run_dir=str(out),
            model_name=f"vmae_dr_{variant}", log_every=500, **kw,
        )
        train_s = time.time() - t0
        print(f"{variant}: best_val={res.best_val:.6f} in {train_s:.0f}s", flush=True)

        ds = load_dr_baseline(a.data, train_subsample=1, initial_step=10, rollout_test=5)
        mk = dict(
            img_size=128, patch_size=16, tubelet_size=1, in_chans=2,
            num_frames=10, encoder_dim=a.encoder_dim, encoder_depth=a.encoder_depth,
            encoder_heads=8, decoder_dim=a.decoder_dim, decoder_depth=a.decoder_depth,
            decoder_heads=8, dtype=jnp.bfloat16,
        )
        if variant == "aux":
            model = VideoMAEOperatorAux(**mk)

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
                                 params=res.params)
            study[k] = m["nRMSE"]
            print(f"rollout {k}: nRMSE={m['nRMSE']:.6f}", flush=True)
        results[variant] = {
            "best_val": float(res.best_val),
            "train_seconds": train_s,
            "rollout_nrmse": [study[k] for k in sorted(study)],
        }
        (out / "summary.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
