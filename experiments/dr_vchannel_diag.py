"""Per-channel rollout diagnostic for the DR transformer v-channel artifact.

Evaluates an existing trained checkpoint under BOTH inference dtypes
(bf16 / fp32) and reports per-channel nRMSE at each rollout horizon, from
the reference's t0=0 test window (utils.py: if_test -> (seed, 0)) and,
for contrast, from a late window (t0=20) where the inhibitor channel has
grown to a healthy amplitude.

Separates two hypotheses for the r1 gap (RESULTS.md):
  - inference precision: fp32 inference on bf16-trained weights fixes v;
  - training-side deficiency: both dtypes show the same v error (the
    queued fp32-training run then isolates fp16-AMP vs bf16 training).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def per_channel_nrmse(pred, tgt):
    """Reference metrics.py:40-45 semantics: per-(sample,channel) RMSE over
    space / RMS of target, averaged over samples; returns (C,) vector."""
    axes = tuple(range(1, pred.ndim - 1))  # spatial (+time) axes, keep B and C
    rmse = jnp.sqrt(jnp.mean((pred - tgt) ** 2, axis=axes))
    nrm = jnp.sqrt(jnp.mean(tgt**2, axis=axes)) + 1e-7
    return jnp.mean(rmse / nrm, axis=0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--ckpt", default="runs/dr_transformer_r2/vmae_dr_basic_ds8_baseline_ckpt")
    p.add_argument("--encoder-dim", type=int, default=1024)
    p.add_argument("--encoder-depth", type=int, default=16)
    p.add_argument("--encoder-heads", type=int, default=16)
    p.add_argument("--decoder-dim", type=int, default=512)
    p.add_argument("--decoder-depth", type=int, default=8)
    p.add_argument("--decoder-heads", type=int, default=8)
    p.add_argument("--rollout", type=int, default=3)
    p.add_argument("--t0", type=int, nargs="+", default=[0, 20])
    p.add_argument("--precisions", nargs="+", default=["bf16", "fp32"])
    p.add_argument("--out", default="runs/dr_transformer_r2/vchannel_diag.json")
    a = p.parse_args(argv)

    from sciml_pde_tpu.data.dr import PRIMARY_FILE, _load_train_pool
    from sciml_pde_tpu.models.transformer import VideoMAEOperator
    from sciml_pde_tpu.utils.checkpoint import restore_params

    _, test, grid = _load_train_pool(Path(a.data), PRIMARY_FILE, 1, None)
    test = np.asarray(test)  # (N, T, H, W, C)
    params, best_val = restore_params(Path(a.ckpt))
    print(f"ckpt best_val={best_val:.6f} test={test.shape}", flush=True)

    results = {}
    for prec in a.precisions:
        model = VideoMAEOperator(
            img_size=128, patch_size=16, tubelet_size=1, in_chans=2,
            num_frames=10, encoder_dim=a.encoder_dim,
            encoder_depth=a.encoder_depth, encoder_heads=a.encoder_heads,
            decoder_dim=a.decoder_dim, decoder_depth=a.decoder_depth,
            decoder_heads=a.decoder_heads,
            dtype=jnp.bfloat16 if prec == "bf16" else jnp.float32,
        )

        from functools import partial

        @partial(jax.jit, static_argnums=(2,))
        def roll(pp, x0, steps_tgt):
            # x0: (B, 10, H, W, C) window; unroll steps_tgt steps
            def body(xx, _):
                pred = model.apply({"params": pp}, xx)  # (B, H, W, C)
                xx = jnp.concatenate([xx[:, 1:], pred[:, None]], axis=1)
                return xx, pred

            _, preds = jax.lax.scan(body, x0, None, length=steps_tgt)
            return preds  # (steps, B, H, W, C)

        for t0 in a.t0:
            x0 = jnp.asarray(test[:, t0 : t0 + 10])
            preds = roll(params, x0, a.rollout)
            row = {}
            for k in range(a.rollout):
                tgt = jnp.asarray(test[:, t0 + 10 + k])
                pc = per_channel_nrmse(preds[k], tgt)
                row[f"r{k+1}"] = [float(v) for v in pc]
                tgt_rms = [float(v) for v in
                           jnp.sqrt(jnp.mean(tgt**2, axis=(0, 1, 2)))]
                row[f"r{k+1}_tgt_rms"] = tgt_rms
            results[f"{prec}_t0={t0}"] = row
            print(f"{prec} t0={t0}: "
                  + " ".join(f"r{k+1}=[u {row[f'r{k+1}'][0]:.4f}, v {row[f'r{k+1}'][1]:.4f}]"
                             for k in range(a.rollout)), flush=True)

    Path(a.out).write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
