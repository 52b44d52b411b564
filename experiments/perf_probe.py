"""Round-5 chip probe: fused-Pallas step vs production step, f32 vs bf16.

One bounded run (queue item) that measures every perf candidate on the
real chip and writes ``experiments/results/perf_probe_r5.json``.  Each
config runs in its OWN SUBPROCESS with a timeout so a Mosaic compile
failure or a tunnel wedge on one variant cannot cost the others.

Round-5 changes (VERDICT r4 #1/#8):
  - per-config timeout raised 420 -> 900 s (observed compile alone was
    174 s; the r4 probe lost its control arm to the tight budget);
  - control arm (prod_f32) always runs FIRST;
  - iso_* configs run each of the five pallas_calls in ISOLATION to
    bisect exactly which kernel trips Mosaic, before the full step.

Configs (flagship shape: batch 4, 128^2, width 20, modes 12, t0 10):
  prod_f32      production scan step (control; should match BENCH_r04)
  prod_bf16     production step, SCIML_DFT_PRECISION=default
  iso_bbfwd     _bb_forward alone          iso_headfwd  _head_forward
  iso_headbwd   _head_backward alone       iso_bbbwd    _bb_backward
  iso_wgrad     _bb_weight_grads alone
  fused_f32     fused Pallas step (ops/fno_fused_step.py)
  fused_bf16    fused step with bf16 dot inputs
  fused_fwd     fused forward only (rollout shape), scan of 100
  fused_b64     fused step at batch 64 (MFU headroom)

Timing rule (PERFORMANCE.md round-3 audit): every window ends with a
device->host VALUE FETCH; block_until_ready can return early on this
backend.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:  # subprocess mode must not depend on PYTHONPATH
    sys.path.insert(0, _REPO)

BATCH, NX, NY, T0, CC = 4, 128, 128, 10, 2
MODES, WIDTH = 12, 20
# CPU smoke override (the interpreter at the flagship shape takes many
# minutes per call): PROBE_NX=16 PROBE_MODES=4 shrink the geometry to
# validate the probe's own plumbing; chip runs use the real shape.
NX = NY = int(os.environ.get("PROBE_NX", NX))
MODES = int(os.environ.get("PROBE_MODES", MODES))
OUT = pathlib.Path(__file__).parent / "results" / "perf_probe_r5.json"

CONFIGS = {
    "prod_f32": {"kind": "prod", "prec": "highest"},
    "prod_bf16": {"kind": "prod", "prec": "default"},
    "iso_bbfwd": {"kind": "iso", "prec": "highest", "which": "bbfwd"},
    "iso_headfwd": {"kind": "iso", "prec": "highest", "which": "headfwd"},
    "iso_headbwd": {"kind": "iso", "prec": "highest", "which": "headbwd"},
    "iso_bbbwd": {"kind": "iso", "prec": "highest", "which": "bbbwd"},
    "iso_wgrad": {"kind": "iso", "prec": "highest", "which": "wgrad"},
    "fused_f32": {"kind": "fused", "prec": "highest"},
    "fused_bf16": {"kind": "fused", "prec": "default"},
    "fused_fwd": {"kind": "fused_fwd", "prec": "highest"},
    "fused_b64": {"kind": "fused", "prec": "highest", "batch": 64},
}


def run_one(name: str) -> dict:
    cfg = CONFIGS[name]
    batch = cfg.get("batch", BATCH)
    import jax

    if os.environ.get("PROBE_CPU"):
        # env JAX_PLATFORMS alone is NOT enough: sitecustomize re-registers
        # the axon TPU plugin via config.update (ROADMAP backend quirk) —
        # a CPU smoke of the probe plumbing must never touch the (likely
        # claimed) chip
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache (no-op if the backend cannot serialize):
    # observed remote compiles run 170-580 s per config
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_traj, n_frames = 8, 32
    data = jnp.asarray(
        rng.normal(size=(n_traj, n_frames, NX, NY, CC)).astype(np.float32)
    )
    gx, gy = np.meshgrid(
        np.linspace(-1, 1, NX, dtype=np.float32),
        np.linspace(-1, 1, NY, dtype=np.float32), indexing="ij",
    )
    grid = jnp.asarray(np.stack([gx, gy], -1))
    K = int(os.environ.get("PROBE_SCAN_K", "200"))
    chunk = jnp.asarray(
        np.stack(
            [rng.integers(0, n_traj, (K, batch)),
             rng.integers(0, n_frames - T0 - 1, (K, batch))], axis=2
        ).astype(np.int32)
    )

    from sciml_pde_tpu.models import FNO2d

    model = FNO2d(num_channels=CC, modes1=MODES, modes2=MODES, width=WIDTH,
                  initial_step=T0)
    x0 = jnp.zeros((1, NX, NY, T0, CC), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, grid[None])["params"]

    res = {"config": name, "batch": batch, "scan_k": K,
           "device": str(jax.devices()[0])}

    if cfg["kind"] == "prod":
        from sciml_pde_tpu.train.fno_train import build_baseline_step
        from sciml_pde_tpu.train.optim import make_optimizer

        tx = make_optimizer(1e-3, total_steps=10_000)
        step_fn, _ = build_baseline_step(model, tx, T0, rollout=1)
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        params, opt_state, losses, _ = step_fn.scan(
            params, opt_state, data, grid, chunk, key
        )
        res["final_loss"] = float(losses[-1])
        res["compile_s"] = time.perf_counter() - t0
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, losses, _ = step_fn.scan(
                params, opt_state, data, grid, chunk, key
            )
            float(losses[-1])
            rates.append(K / (time.perf_counter() - t0))
    elif cfg["kind"] == "fused":
        from sciml_pde_tpu.train.fast_step import (
            build_fast_baseline_step, fast_state_from_tree, init_opt,
        )

        theta, spec = fast_state_from_tree(params, MODES)
        _, fscan = build_fast_baseline_step(MODES, T0, spec, 1e-3, 10_000)
        opt = init_opt(theta)
        grid2 = jnp.transpose(grid, (2, 0, 1))
        t0 = time.perf_counter()
        theta, opt, losses, _ = fscan(theta, opt, data, grid2, chunk)
        res["final_loss"] = float(losses[-1])
        res["compile_s"] = time.perf_counter() - t0
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            theta, opt, losses, _ = fscan(theta, opt, data, grid2, chunk)
            float(losses[-1])
            rates.append(K / (time.perf_counter() - t0))
    elif cfg["kind"] == "iso":
        # one pallas_call in isolation: bisects a Mosaic lowering failure
        # to the exact kernel (each iso config is its own subprocess)
        from sciml_pde_tpu.ops import fno_fused_step as ffs

        fp = ffs.pack_params(params, MODES, MODES)
        grid2 = jnp.transpose(grid, (2, 0, 1))
        pad = 2
        # PHYSICAL (tile-padded) field dims, matching _bb_forward's spills
        hp, wp = ffs._pad8(NX + pad), ffs._pad128(NY + pad)
        win = jnp.asarray(
            rng.normal(size=(batch, T0, CC, NX, NY)).astype(np.float32)
        )
        bbout = jnp.asarray(
            rng.normal(size=(batch, WIDTH, NX, NY)).astype(np.float32)
        )
        stats = jnp.concatenate(
            [jnp.zeros((batch, CC, 1)), jnp.ones((batch, CC, 1))], axis=2
        )
        pre = jnp.asarray(rng.normal(
            size=(batch, ffs.L_LAYERS, WIDTH, hp, wp)).astype(np.float32))
        h0p = jnp.asarray(
            rng.normal(size=(batch, WIDTH, hp, wp)).astype(np.float32))
        dpred = jnp.asarray(
            rng.normal(size=(batch, CC, NX, NY)).astype(np.float32))

        # big tensors enter as jit ARGUMENTS: captured as closure
        # constants they become XLA constants the compiler tried to
        # place in VMEM "stack" (iso_bbbwd OOMed that way)
        which = cfg["which"]
        if which == "bbfwd":
            fn = jax.jit(lambda w, g: ffs._bb_forward(
                w, g, fp, MODES, MODES, pad)[1])
            args = (win, grid2)
        elif which == "headfwd":
            fn = jax.jit(lambda bb, st: ffs._head_forward(bb, st, fp))
            args = (bbout, stats)
        elif which == "headbwd":
            fn = jax.jit(lambda dp, bb, st: ffs._head_backward(
                dp, bb, st, fp)[0])
            args = (dpred, bbout, stats)
        elif which == "bbbwd":
            fn = jax.jit(lambda db, pr, w, st: ffs._bb_backward(
                db, pr, w, grid2, st, fp, MODES, MODES, pad)[0])
            args = (bbout, pre, win, stats)
        else:  # wgrad
            fn = jax.jit(lambda pr, h0, dp: ffs._bb_weight_grads(
                pr, h0, dp, fp, MODES, MODES, pad, NX, NY)[0])
            args = (pre, h0p, pre)
        t0 = time.perf_counter()
        out0 = fn(*args)
        first = float(jnp.sum(out0))
        res["compile_s"] = time.perf_counter() - t0
        res["finite"] = bool(np.isfinite(first))
        iters = int(os.environ.get("PROBE_ITERS", "20"))
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _k in range(iters):
                out0 = fn(*args)
            float(jnp.sum(out0))
            rates.append(iters / (time.perf_counter() - t0))
    else:  # fused_fwd: forward-only rollout shape
        import functools

        from sciml_pde_tpu.ops.fno_fused_step import (
            fno2d_fused_apply, pack_params,
        )

        fp = pack_params(params, MODES, MODES)
        grid2 = jnp.transpose(grid, (2, 0, 1))
        win = jnp.asarray(
            rng.normal(size=(batch, T0, CC, NX, NY)).astype(np.float32)
        )

        @jax.jit
        def roll(win, fp):
            def body(w, _):
                pred = fno2d_fused_apply(w, grid2, fp, MODES, MODES)
                w = jnp.concatenate([w[:, 1:], pred[:, None]], axis=1)
                return w, jnp.sum(pred)

            w, s = jax.lax.scan(body, win, None, length=100)
            return s[-1]

        t0 = time.perf_counter()
        float(roll(win, fp))
        res["compile_s"] = time.perf_counter() - t0
        rates = []
        K = 100
        res["scan_k"] = K
        for _ in range(3):
            t0 = time.perf_counter()
            float(roll(win, fp))
            rates.append(K / (time.perf_counter() - t0))

    res["steps_per_sec"] = float(np.median(rates))
    res["steps_per_sec_windows"] = [round(r, 1) for r in rates]
    res["step_ms"] = 1000.0 / res["steps_per_sec"]
    return res


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="run ONE config (subprocess mode)")
    p.add_argument("--timeout", type=int, default=900, help="per-config budget")
    p.add_argument("--configs", default=",".join(CONFIGS))
    a = p.parse_args(argv)

    if a.config:
        env_prec = CONFIGS[a.config]["prec"]
        os.environ["SCIML_DFT_PRECISION"] = env_prec
        from sciml_pde_tpu.ops.spectral import set_dft_precision

        set_dft_precision(env_prec)
        try:
            res = run_one(a.config)
        except Exception as e:  # noqa: BLE001 — ship the REAL compiler
            # error through the result channel: Mosaic exceptions embed
            # megabytes of MLIR and the parent's stderr tail window
            # loses the message lines otherwise
            import re as _re

            msg = f"{type(e).__name__}: {e}"
            lines = [
                ln for ln in msg.splitlines()
                if _re.search(
                    r"(?i)error|failed|not implemented|unsupported|"
                    r"check failed|ran out", ln)
            ]
            res = {"config": a.config, "error": type(e).__name__,
                   "error_lines": lines[:12] or [msg[:300], msg[-300:]]}
        print("PROBE_RESULT " + json.dumps(res), flush=True)
        return

    # merge with any prior run so a partial re-run (e.g. just the fused
    # configs after a kernel fix) keeps the control rows
    try:
        results = json.loads(OUT.read_text())
    except (OSError, ValueError):
        results = {}
    for name in a.configs.split(","):
        cmd = [sys.executable, __file__, "--config", name]
        t0 = time.time()
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=a.timeout,
                env={**os.environ,
                     "SCIML_DFT_PRECISION": CONFIGS[name]["prec"],
                     "PYTHONPATH": _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")},
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("PROBE_RESULT ")]
            if line:
                results[name] = json.loads(line[-1][len("PROBE_RESULT "):])
            else:
                tail = (out.stderr or out.stdout or "")[-2000:]
                results[name] = {"config": name, "error": f"rc={out.returncode}",
                                 "tail": tail}
        except subprocess.TimeoutExpired:
            results[name] = {"config": name, "error": "timeout"}
        results[name]["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(results[name]), flush=True)
        OUT.parent.mkdir(parents=True, exist_ok=True)
        OUT.write_text(json.dumps(results, indent=1))
    print("probe complete ->", OUT, flush=True)


if __name__ == "__main__":
    main()
