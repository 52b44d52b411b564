"""Which nRMSE convention produced the published DR transformer table?

The published rollout row (``Plot Generator/rollout.py:38``:
0.105883/0.109151/0.115661/0.12328/0.131266) cannot be reconciled with a
per-channel-normalized metric at the reference's own test protocol
(t0=0 window, ``Baseline_rollout/utils.py``): the inhibitor channel at
frame 10 has RMS ~0.018 (intrinsic — see RESULTS.md data audit), so a
per-channel score of 0.106 would require fitting a dying noise-seeded
field to ~10% relative error.  Meanwhile the reference *trainer*'s own
loss/val metric (``train_transformer_rd.py:64-70``) is nRMSE normalized
JOINTLY over (C,H,W) — and our best-val under that metric (0.1039)
already sits at the published r1.

This diagnostic evaluates trained checkpoints from the t0=0 test window
and reports rollout-k tables under all four conventions:

  joint  x {final step, all unrolled steps}   (trainer val metric)
  perch  x {final step, all unrolled steps}   (metrics.py metric_func)

If the joint all-steps row lands on the published row, the remaining
"v-channel artifact" is a metric-convention difference, not a model gap.
"""

from __future__ import annotations

import argparse
import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

PUBLISHED = {
    "baseline": [0.105883, 0.109151, 0.115661, 0.12328, 0.131266],
    "aux": [0.0602556, 0.0709661, 0.0863324, 0.102376, 0.11813],
}


def joint_nrmse(pred, tgt):
    """Reference train_transformer_rd.py:64-70: normalize over (C,H,W)
    jointly per sample, then mean over batch."""
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean((pred - tgt) ** 2, axis=axes)
    denom = jnp.mean(tgt**2, axis=axes) + 1e-7
    return float(jnp.mean(jnp.sqrt(mse) / jnp.sqrt(denom)))


def perch_nrmse(pred, tgt):
    """Reference metrics.py metric_func: per-(sample,channel) normalized,
    averaged over channels and batch (channels-last layout here)."""
    axes = tuple(range(1, pred.ndim - 1))
    rmse = jnp.sqrt(jnp.mean((pred - tgt) ** 2, axis=axes))
    nrm = jnp.sqrt(jnp.mean(tgt**2, axis=axes)) + 1e-7
    return float(jnp.mean(rmse / nrm))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--ckpts", nargs="+", default=[
        "baseline=runs/dr_transformer_r2/vmae_dr_basic_ds8_baseline_ckpt",
        "aux=runs/dr_transformer_r2/vmae_dr_basic_ds8_aux_v2_ckpt",
    ], help="name=path pairs; name picks the published row to compare")
    p.add_argument("--encoder-dim", type=int, default=1024)
    p.add_argument("--encoder-depth", type=int, default=16)
    p.add_argument("--encoder-heads", type=int, default=16)
    p.add_argument("--decoder-dim", type=int, default=512)
    p.add_argument("--decoder-depth", type=int, default=8)
    p.add_argument("--decoder-heads", type=int, default=8)
    p.add_argument("--rollout", type=int, default=5)
    p.add_argument("--t0", type=int, default=0)
    p.add_argument("--out", default="runs/dr_transformer_r2/convention_eval.json")
    a = p.parse_args(argv)

    from sciml_pde_tpu.data.dr import PRIMARY_FILE, _load_train_pool
    from sciml_pde_tpu.models.transformer import VideoMAEOperator
    from sciml_pde_tpu.utils.checkpoint import restore_params

    _, test, _grid = _load_train_pool(Path(a.data), PRIMARY_FILE, 1, None)
    test = np.asarray(test)  # (N, T, H, W, C)

    model = VideoMAEOperator(
        img_size=128, patch_size=16, tubelet_size=1, in_chans=2,
        num_frames=10, encoder_dim=a.encoder_dim,
        encoder_depth=a.encoder_depth, encoder_heads=a.encoder_heads,
        decoder_dim=a.decoder_dim, decoder_depth=a.decoder_depth,
        decoder_heads=a.decoder_heads, dtype=jnp.bfloat16,
    )

    @partial(jax.jit, static_argnums=(2,))
    def roll(pp, x0, steps):
        def body(xx, _):
            pred = model.apply({"params": pp}, xx)
            xx = jnp.concatenate([xx[:, 1:], pred[:, None]], axis=1)
            return xx, pred

        _, preds = jax.lax.scan(body, x0, None, length=steps)
        return preds  # (steps, B, H, W, C)

    results = {}
    for spec in a.ckpts:
        name, path = spec.split("=", 1)
        if not Path(path).exists():
            print(f"skip {name}: no checkpoint at {path}", flush=True)
            continue
        params, best_val = restore_params(Path(path))
        x0 = jnp.asarray(test[:, a.t0 : a.t0 + 10])
        preds = roll(params, x0, a.rollout)

        tgts = [jnp.asarray(test[:, a.t0 + 10 + k]) for k in range(a.rollout)]
        row = {c: [] for c in
               ("joint_final", "joint_all", "perch_final", "perch_all")}
        for k in range(a.rollout):
            row["joint_final"].append(joint_nrmse(preds[k], tgts[k]))
            row["perch_final"].append(perch_nrmse(preds[k], tgts[k]))
            # all-steps: score frames 1..k+1 together, time stacked on batch
            pa = jnp.concatenate([preds[j] for j in range(k + 1)], axis=0)
            ta = jnp.concatenate(tgts[: k + 1], axis=0)
            row["joint_all"].append(joint_nrmse(pa, ta))
            row["perch_all"].append(perch_nrmse(pa, ta))
        row["best_val"] = float(best_val)
        row["published"] = PUBLISHED.get(name)
        results[name] = row
        print(f"== {name} (best_val {best_val:.4f}) ==", flush=True)
        for c in ("joint_final", "joint_all", "perch_final", "perch_all"):
            print(f"  {c:12s} " + " ".join(f"{v:.4f}" for v in row[c]),
                  flush=True)
        if row["published"]:
            print(f"  {'published':12s} "
                  + " ".join(f"{v:.4f}" for v in row["published"]), flush=True)

    Path(a.out).parent.mkdir(parents=True, exist_ok=True)
    Path(a.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
