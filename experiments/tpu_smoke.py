"""On-chip Pallas smoke gate (VERDICT r4 #3).

Round 4 shipped an 837-line fused Pallas step whose equivalence suite was
interpreter-only — and the kernels SIGABRTed on the first real-TPU
compile.  This gate is the process fix: it executes, ON THE REAL DEVICE,

  1. one fused FNO-2D train step (all five pallas_calls of
     ops/fno_fused_step.py through train/fast_step.py), and
  2. one Pallas flash-attention call (ops/attention.py),

checks finiteness of the results, and writes
``experiments/results/tpu_smoke.json``.  Exit code 0 = both executed and
produced finite values on TPU.  Non-TPU backends exit 3 (NOT a pass).

Discipline: no Pallas kernel may be called "landed" in PERFORMANCE.md or
RESULTS.md from interpreter evidence alone — this gate (or a perf_probe
run) must have executed it on chip first.  Queue scripts run this as a
preamble before any item that depends on a Pallas path.

Small shapes are useless here (Mosaic layout legality depends on the
actual tile geometry): the fused step runs at the flagship shape
(batch 4, 128^2, width 20, modes 12, t0 10).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

OUT = pathlib.Path(__file__).parent / "results" / "tpu_smoke.json"


def main() -> int:
    import jax

    # persistent compile cache (no-op if the backend cannot serialize)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    res: dict = {"device": str(jax.devices()[0]),
                 "backend": jax.default_backend()}
    if jax.default_backend() != "tpu":
        res["verdict"] = "SKIP (backend is not tpu — interpreter evidence "
        res["verdict"] += "does not count)"
        print(json.dumps(res), flush=True)
        return 3

    ok = True

    # --- 1. one fused train step at the flagship shape -------------------
    try:
        from sciml_pde_tpu.models import FNO2d
        from sciml_pde_tpu.train.fast_step import (
            build_fast_baseline_step, fast_state_from_tree, init_opt,
        )

        BATCH, NX, NY, T0, CC, MODES, WIDTH = 4, 128, 128, 10, 2, 12, 20
        rng = np.random.default_rng(0)
        data = jnp.asarray(rng.normal(
            size=(2, T0 + 2, NX, NY, CC)).astype(np.float32))
        gx, gy = np.meshgrid(
            np.linspace(-1, 1, NX, dtype=np.float32),
            np.linspace(-1, 1, NY, dtype=np.float32), indexing="ij")
        grid = jnp.asarray(np.stack([gx, gy], -1))
        model = FNO2d(num_channels=CC, modes1=MODES, modes2=MODES,
                      width=WIDTH, initial_step=T0)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, NX, NY, T0, CC), jnp.float32), grid[None],
        )["params"]
        theta, spec = fast_state_from_tree(params, MODES)
        _, fscan = build_fast_baseline_step(MODES, T0, spec, 1e-3, 100)
        opt = init_opt(theta)
        chunk = jnp.zeros((1, BATCH, 2), jnp.int32)  # ONE step
        grid2 = jnp.transpose(grid, (2, 0, 1))
        t0 = time.perf_counter()
        theta, opt, losses, _ = fscan(theta, opt, data, grid2, chunk)
        loss = float(losses[-1])  # value fetch = the honest sync
        res["fused_step"] = {
            "loss": loss, "finite": bool(np.isfinite(loss)),
            "compile_plus_step_s": round(time.perf_counter() - t0, 1),
        }
        ok &= res["fused_step"]["finite"]
    except Exception as e:  # noqa: BLE001 — verdict file must always appear
        msg = f"{type(e).__name__}: {e}"
        # keep head AND tail: the Mosaic error text sits at the END of the
        # remote-compile-helper wrapper noise
        res["fused_step"] = {
            "error": msg[:300] + (" ... " + msg[-1500:] if len(msg) > 1800 else msg[300:]),
        }
        ok = False

    # --- 2. one flash-attention call ------------------------------------
    try:
        from sciml_pde_tpu.ops.attention import flash_attention

        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(2, 4, 256, 64)).astype(np.float32))
        o = flash_attention(q, q, q, scale=64 ** -0.5)
        s = float(jnp.sum(o))
        res["flash_attention"] = {"sum": s, "finite": bool(np.isfinite(s))}
        ok &= res["flash_attention"]["finite"]
    except Exception as e:  # noqa: BLE001
        res["flash_attention"] = {"error": f"{type(e).__name__}: {e}"[:500]}
        ok = False

    res["verdict"] = "PASS" if ok else "FAIL"
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
