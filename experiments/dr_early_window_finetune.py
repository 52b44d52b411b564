"""Early-window fine-tune diagnostic for the DR transformer v-channel gap.

Hypothesis 3 of the v-channel investigation (see dr_vchannel_diag.py):
t0=0-like windows — where the inhibitor channel is near zero and its
per-(sample,channel) input normalization is ill-conditioned — are only
~1/91st of the training distribution, so the regime is under-trained.

This script restores the trained baseline checkpoint, fine-tunes for a
few epochs on windows with t0 <= --t0-max ONLY (reference objective:
sqrt joint-channel nRMSE + 0.1 relative-FFT), and re-measures the
per-channel t0=0 rollout.  A collapse of the v error confirms the
coverage hypothesis and motivates window-weighted sampling as the
production fix; no movement points back at the optimizer/precision.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax


def per_channel_nrmse(pred, tgt):
    axes = tuple(range(1, pred.ndim - 1))
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
    p.add_argument("--n-train", type=int, default=8)
    p.add_argument("--t0-max", type=int, default=12)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--rollout", type=int, default=3)
    p.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--out", default="runs/dr_transformer_r2/early_finetune.json")
    a = p.parse_args(argv)

    from sciml_pde_tpu.data.dr import PRIMARY_FILE, _load_train_pool
    from sciml_pde_tpu.models.transformer import VideoMAEOperator
    from sciml_pde_tpu.train.transformer_train import (
        fft_relative_l2,
        transformer_nrmse_sqrt,
    )
    from sciml_pde_tpu.utils.checkpoint import restore_params

    train, test, _ = _load_train_pool(Path(a.data), PRIMARY_FILE, a.n_train, None)
    train = jnp.asarray(np.asarray(train))  # (N, T, H, W, C)
    test = np.asarray(test)
    params, best_val = restore_params(Path(a.ckpt))
    print(f"ckpt best_val={best_val:.6f} train={train.shape}", flush=True)

    model = VideoMAEOperator(
        img_size=128, patch_size=16, tubelet_size=1, in_chans=2,
        num_frames=10, encoder_dim=a.encoder_dim,
        encoder_depth=a.encoder_depth, encoder_heads=a.encoder_heads,
        decoder_dim=a.decoder_dim, decoder_depth=a.decoder_depth,
        decoder_heads=a.decoder_heads,
        dtype=jnp.bfloat16 if a.precision == "bf16" else jnp.float32,
    )

    def eval_t0(pp, t0):
        @jax.jit
        def roll(pp, x0):
            def body(xx, _):
                pred = model.apply({"params": pp}, xx)
                return jnp.concatenate([xx[:, 1:], pred[:, None]], axis=1), pred
            _, preds = jax.lax.scan(body, x0, None, length=a.rollout)
            return preds

        preds = roll(pp, jnp.asarray(test[:, t0 : t0 + 10]))
        return {
            f"r{k+1}": [float(v) for v in per_channel_nrmse(
                preds[k], jnp.asarray(test[:, t0 + 10 + k]))]
            for k in range(a.rollout)
        }

    before = {f"t0={t0}": eval_t0(params, t0) for t0 in (0, 20)}
    print("before:", json.dumps(before), flush=True)

    # fine-tune on early windows only
    idx = [(n, t0) for n in range(train.shape[0]) for t0 in range(a.t0_max + 1)]
    idx = np.asarray(idx)
    steps_total = max(a.epochs * (len(idx) // a.batch_size), 1)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(a.lr, steps_total),
                    weight_decay=0.05),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(pp, st, rows):
        x = train[rows[:, 0, None], rows[:, 1, None] + jnp.arange(10)[None]]
        y = train[rows[:, 0], rows[:, 1] + 10]

        def loss_fn(q):
            pred = model.apply({"params": q}, x)
            return (transformer_nrmse_sqrt(pred, y)
                    + 0.1 * fft_relative_l2(pred, y))

        loss, grads = jax.value_and_grad(loss_fn)(pp)
        updates, st = tx.update(grads, st, pp)
        return optax.apply_updates(pp, updates), st, loss

    rng = np.random.default_rng(0)
    for ep in range(a.epochs):
        order = rng.permutation(len(idx))
        losses = []
        for b in range(0, len(idx) - a.batch_size + 1, a.batch_size):
            rows = jnp.asarray(idx[order[b : b + a.batch_size]])
            params, opt_state, loss = step(params, opt_state, rows)
            losses.append(float(loss))
        print(f"epoch {ep}: loss={np.mean(losses):.5f}", flush=True)

    after = {f"t0={t0}": eval_t0(params, t0) for t0 in (0, 20)}
    print("after:", json.dumps(after), flush=True)
    Path(a.out).write_text(json.dumps(
        {"before": before, "after": after, "config": vars(a)}, indent=1))


if __name__ == "__main__":
    main()
