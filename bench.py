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
the driver-defined target is ">=2x H100 training steps/sec/chip".  The
denominator is the MEASURED+analytic H100 bound produced by
``experiments/torch_baseline.py`` (results/torch_cpu_baseline.json):
min(flops bound at 50% TF32 utilization, kernel-launch bound from the
profiled 297-op eager step at an optimistic 3 us/launch) — the
reference's eager fp32 torch step is launch-bound at this batch-4,
128^2 shape, so the launch bound (~1.1k steps/s) governs.  Falls back
to that recorded constant if the JSON is absent.

Two loop shapes are measured, both median-of-5 windows:
  - per-dispatch: one optimizer step per host->device dispatch (the naive
    loop; throttle-sensitive on tunneled backends, PERFORMANCE.md);
  - scan-chunk: K=100 steps per dispatch via lax.scan (the production
    TPU train-loop shape).
The headline value is the better of the two.  Also reported: HLO
flops/step (XLA cost analysis) and the implied MFU against the v5e bf16
peak (197 TFLOP/s).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H100_BOUND_FALLBACK_STEPS_PER_SEC = 1122.0  # experiments/results/torch_cpu_baseline.json
V5E_BF16_PEAK_FLOPS = 197e12
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

    # a pool of distinct index batches, cycled per step, so measurement
    # covers differently-shaped gathers rather than one cached batch
    idx_pool = [
        np.stack(
            [
                rng.integers(0, n_traj, BATCH),
                rng.integers(0, n_frames - INITIAL_STEP - 1, BATCH),
            ],
            axis=1,
        ).astype(np.int32)
        for _ in range(16)
    ]
    idx = idx_pool[0]

    x0 = jnp.zeros((1, NX, NY, INITIAL_STEP, CHANNELS), jnp.float32)
    g0 = grid[None]
    params = model.init(jax.random.PRNGKey(0), x0, g0)["params"]
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    data = replicate(data, mesh)
    grid_r = replicate(grid, mesh)
    bidx_pool = [shard_batch(i, mesh) for i in idx_pool]
    bidx = bidx_pool[0]

    key = jax.random.PRNGKey(0)

    # ---- training throughput -------------------------------------------
    # warmup / compile
    t0 = time.perf_counter()
    for _ in range(3):
        params, opt_state, loss, g_norm = step_fn(params, opt_state, data, grid_r, bidx, key)
    jax.block_until_ready(params)
    print(f"[bench] train-step compile+warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    # five measurement windows; report the MEDIAN and the spread (the
    # tunnel/runtime adds run-to-run noise well above kernel variance —
    # median is robust to a wedged window without cherry-picking the top)
    n_steps = 200
    rates = []
    for w in range(5):
        t0 = time.perf_counter()
        for s in range(n_steps):
            params, opt_state, loss, g_norm = step_fn(
                params, opt_state, data, grid_r, bidx_pool[s % len(bidx_pool)], key
            )
        jax.block_until_ready(params)
        rates.append(n_steps / (time.perf_counter() - t0))
    dispatch_steps_per_sec = float(np.median(rates))
    final_loss = float(loss)
    print(
        f"[bench] per-dispatch windows {[round(r,1) for r in rates]} steps/s, "
        f"median {dispatch_steps_per_sec:.1f} (loss={final_loss:.4f})",
        file=sys.stderr, flush=True,
    )

    # ---- scan-chunked loop: K optimizer steps per dispatch ---------------
    # The production train-loop shape on TPU (the whole loop lives in one
    # compiled program), and robust to the tunnel's dispatch-rate throttle
    # that dominates per-dispatch numbers at this small shape
    # (PERFORMANCE.md).  Steps are identical optimizer steps over distinct
    # window-index batches.
    K = 100
    chunk_pool = [
        jnp.asarray(
            np.stack(
                [
                    rng.integers(0, n_traj, (K, BATCH)),
                    rng.integers(0, n_frames - INITIAL_STEP - 1, (K, BATCH)),
                ],
                axis=2,
            ).astype(np.int32)
        )
        for _ in range(4)
    ]
    t0 = time.perf_counter()
    params, opt_state, losses, _ = step_fn.scan(
        params, opt_state, data, grid_r, chunk_pool[0], key
    )
    jax.block_until_ready(params)
    print(f"[bench] scan-chunk compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    scan_rates = []
    n_chunks = 5
    for w in range(5):
        t0 = time.perf_counter()
        for c in range(n_chunks):
            params, opt_state, losses, _ = step_fn.scan(
                params, opt_state, data, grid_r, chunk_pool[c % len(chunk_pool)], key
            )
        jax.block_until_ready(params)
        scan_rates.append(n_chunks * K / (time.perf_counter() - t0))
    scan_steps_per_sec = float(np.median(scan_rates))
    final_loss = float(losses[-1])
    print(
        f"[bench] scan-chunk(K={K}) windows {[round(r,1) for r in scan_rates]} "
        f"steps/s, median {scan_steps_per_sec:.1f} (loss={final_loss:.4f})",
        file=sys.stderr, flush=True,
    )
    steps_per_sec = max(scan_steps_per_sec, dispatch_steps_per_sec)

    # HLO flops of one compiled step -> MFU against the v5e bf16 peak
    flops_per_step = None
    try:
        lowered = step_fn.lower(params, opt_state, data, grid_r, bidx, key)
        cost = lowered.compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops_per_step = float(c.get("flops", 0.0)) or None
    except Exception as e:  # cost analysis is backend-dependent
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)
    mfu = (
        flops_per_step * steps_per_sec / V5E_BF16_PEAK_FLOPS
        if flops_per_step
        else None
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

    import pathlib

    baseline_path = pathlib.Path(__file__).parent / "experiments" / "results" / "torch_cpu_baseline.json"
    h100_bound = H100_BOUND_FALLBACK_STEPS_PER_SEC
    torch_cpu = None
    if baseline_path.exists():
        b = json.loads(baseline_path.read_text())
        h100_bound = float(b.get("h100_steps_per_sec_bound", h100_bound))
        torch_cpu = b.get("torch_cpu_steps_per_sec")

    details = {
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
        "batch": BATCH,
        "train_steps_per_sec": steps_per_sec,
        "dispatch_steps_per_sec": dispatch_steps_per_sec,
        "dispatch_steps_per_sec_windows": [round(r, 1) for r in rates],
        "scan_chunk": K,
        "scan_steps_per_sec": scan_steps_per_sec,
        "scan_steps_per_sec_windows": [round(r, 1) for r in scan_rates],
        "train_step_ms": 1000.0 / steps_per_sec,
        "hlo_flops_per_step": flops_per_step,
        "mfu_vs_v5e_bf16_peak": mfu,
        "rollout100_wall_s": rollout_s,
        "rollout100_steps_per_sec": 100.0 / rollout_s,
        "h100_bound_steps_per_sec": h100_bound,
        "torch_cpu_steps_per_sec": torch_cpu,
        "final_loss": final_loss,
    }
    print(json.dumps(details), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "fno2d_dr_train_steps_per_sec",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / h100_bound, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
