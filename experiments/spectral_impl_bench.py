"""A/B the spectral-conv implementations on the current backend.

Measures full FNO2d optimizer steps (gather + fwd + bwd + clip + Adam) for
impl in {dft, dft2} at the DR bench shape and optionally the NS production
shape, and probes whether native (non-interpret) Pallas kernels compile on
this backend at all — ``ops/attention.py`` currently falls back to
interpret mode whenever ``jax.default_backend() != "tpu"``, which on the
axon platform may be leaving real Mosaic performance on the table.

Run on a quiet chip (~2-4 min).  Prints one JSON line per shape plus a
pallas-probe line; exit code 0 even if the probe fails (the probe result
is data, not an error).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_shape(name, batch, nx, channels, steps, windows=5):
    import jax
    import jax.numpy as jnp

    from sciml_pde_tpu.models import FNO2d
    from sciml_pde_tpu.ops import spectral as S
    from sciml_pde_tpu.train.fno_train import build_baseline_step
    from sciml_pde_tpu.train.optim import make_optimizer

    rng = np.random.default_rng(0)
    initial_step = 10
    n_traj, n_frames = 8, 32
    data = jnp.asarray(
        rng.normal(size=(n_traj, n_frames, nx, nx, channels)).astype(np.float32)
    )
    gx, gy = np.meshgrid(
        np.linspace(-1, 1, nx, dtype=np.float32),
        np.linspace(-1, 1, nx, dtype=np.float32),
        indexing="ij",
    )
    grid = jnp.asarray(np.stack([gx, gy], -1))
    idx_pool = [
        jnp.asarray(
            np.stack(
                [
                    rng.integers(0, n_traj, batch),
                    rng.integers(0, n_frames - initial_step - 1, batch),
                ],
                axis=1,
            ).astype(np.int32)
        )
        for _ in range(16)
    ]
    key = jax.random.PRNGKey(0)
    out = {"shape": name, "batch": batch, "nx": nx}

    for impl in ("dft", "dft2"):
        S.set_spectral_impl(impl)
        model = FNO2d(
            num_channels=channels, modes1=12, modes2=12, width=20,
            initial_step=initial_step,
        )
        tx = make_optimizer(1e-3, total_steps=10_000)
        step_fn, _ = build_baseline_step(model, tx, initial_step, rollout=1)
        x0 = jnp.zeros((1, nx, nx, initial_step, channels), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x0, grid[None])["params"]
        opt_state = tx.init(params)
        t0 = time.perf_counter()
        for _ in range(3):
            params, opt_state, loss, _ = step_fn(params, opt_state, data, grid, idx_pool[0], key)
        jax.block_until_ready(params)
        compile_s = time.perf_counter() - t0
        rates = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for s in range(steps):
                params, opt_state, loss, _ = step_fn(
                    params, opt_state, data, grid, idx_pool[s % len(idx_pool)], key
                )
            jax.block_until_ready(params)
            rates.append(steps / (time.perf_counter() - t0))
        out[impl] = {
            "steps_per_sec_median": float(np.median(rates)),
            "windows": [round(r, 1) for r in rates],
            "compile_s": round(compile_s, 1),
            "final_loss": float(loss),
        }
        print(f"[{name}] {impl}: {out[impl]}", file=sys.stderr, flush=True)
    S.set_spectral_impl("dft")
    out["speedup_dft2_vs_dft"] = round(
        out["dft2"]["steps_per_sec_median"] / out["dft"]["steps_per_sec_median"], 3
    )
    return out


def probe_pallas_native():
    """Can pallas_call(interpret=False) compile+run on this backend?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    res = {"default_backend": jax.default_backend(),
           "platform": jax.devices()[0].platform}
    try:
        x = jnp.ones((8, 128), jnp.float32)
        y = pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype), interpret=False
        )(x)
        jax.block_until_ready(y)
        res["pallas_native"] = bool(np.allclose(np.asarray(y), 2.0))
    except Exception as e:  # noqa: BLE001 - the probe result is data
        res["pallas_native"] = False
        res["error"] = f"{type(e).__name__}: {e}"[:300]
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--ns", action="store_true", help="also run the NS 256^2 shape")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    results = {"pallas_probe": probe_pallas_native()}
    print(json.dumps(results["pallas_probe"]), flush=True)
    results["dr"] = bench_shape("dr", batch=4, nx=128, channels=2, steps=args.steps)
    print(json.dumps(results["dr"]), flush=True)
    if args.ns:
        results["ns"] = bench_shape("ns", batch=8, nx=256, channels=3, steps=max(args.steps // 4, 20))
        print(json.dumps(results["ns"]), flush=True)
    if args.out:
        from pathlib import Path

        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
