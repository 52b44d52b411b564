"""Benchmark harness: FNO-2D diffusion-reaction training throughput.

Measures the flagship configuration from the reference
(``models/config/config_dr.yaml:44-47``: 128x128 grid, 2 channels,
initial_step 10, modes 12, width 20; batch 4) as full optimizer steps —
window gather from the HBM-resident trajectory store, forward, backward,
adaptive clip, Adam, LR schedule — i.e. exactly what one training step
costs, then a 100-step autoregressive rollout (the second tracked metric
in BASELINE.md).

Prints the headline JSON line
  {"metric": "fno2d_dr_train_steps_per_sec", "value": ..., "unit": "steps/s",
   "vs_baseline": ...}
**incrementally**: once after the FIRST completed measurement window and
again after every later phase that improves it, so a wedged tunnel or an
external timeout can never erase the whole run's evidence (round 2 lost
its only perf artifact exactly that way: rc=124 after compile+warmup,
nothing emitted).  Robustness layers:

  1. every completed phase immediately prints the current headline to
     stdout (flushed) and persists it + details to the tracked
     ``experiments/results/bench_last_good.json``;
  2. a daemon watchdog thread force-exits the process (rc 0) at a hard
     deadline (``BENCH_DEADLINE_S``, default 480 s), emitting the best
     result so far — a hung device->host RPC cannot block it;
  3. if NOTHING completes before the deadline (wedge during compile),
     the last-good file from a previous run is emitted with
     ``"fallback": true`` in the details.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the driver-defined target is ">=2x H100 training steps/sec/chip".  The
denominator is the MEASURED+analytic H100 bound produced by
``experiments/torch_baseline.py`` (results/torch_cpu_baseline.json):
min(flops bound at 50% TF32 utilization, kernel-launch bound from the
profiled 297-op eager step at an optimistic 3 us/launch) — the
reference's eager fp32 torch step is launch-bound at this batch-4,
128^2 shape, so the launch bound (~1.1k steps/s) governs.

Two loop shapes are measured (budget permitting):
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
import os
import pathlib
import sys
import threading
import time

import numpy as np

H100_BOUND_FALLBACK_STEPS_PER_SEC = 1122.0  # experiments/results/torch_cpu_baseline.json
V5E_BF16_PEAK_FLOPS = 197e12
BATCH = 4
NX = NY = 128
INITIAL_STEP = 10
CHANNELS = 2

_RESULTS_DIR = pathlib.Path(__file__).parent / "experiments" / "results"
_LAST_GOOD = _RESULTS_DIR / "bench_last_good.json"
_T0 = time.monotonic()


def _log(msg: str) -> None:
    print(f"[bench +{time.monotonic()-_T0:5.1f}s] {msg}", file=sys.stderr, flush=True)


class Emitter:
    """Best-so-far result holder; every update is immediately durable.

    ``emit()`` prints the details dict (stderr) then the one-line headline
    (stdout, flushed) and atomically rewrites the tracked last-good file.
    The driver parses the LAST headline line it sees, so re-emitting an
    improved value is safe and a mid-run kill keeps the previous one.
    """

    def __init__(self, h100_bound: float, persist: bool = True):
        self.h100_bound = h100_bound
        self.persist = persist
        self.details: dict = {}
        # candidates keyed by loop shape: a later, better measurement of the
        # SAME shape (e.g. the 5-window median superseding the first window)
        # replaces its key instead of being max'd against it — the headline
        # is the max across shapes, never a lucky single window.
        self.candidates: dict[str, float] = {}
        self._lock = threading.Lock()
        self._emitted_any = False

    @property
    def steps_per_sec(self) -> float | None:
        return max(self.candidates.values()) if self.candidates else None

    def update(
        self, steps_per_sec: float | None = None, candidate: str = "dispatch",
        **details,
    ) -> None:
        with self._lock:
            if steps_per_sec is not None:
                self.candidates[candidate] = steps_per_sec
            self.details.update(details)
            self._emit_locked()

    def _headline(self) -> dict | None:
        if self.steps_per_sec is None:
            return None
        return {
            "metric": "fno2d_dr_train_steps_per_sec",
            "value": round(self.steps_per_sec, 2),
            "unit": "steps/s",
            "vs_baseline": round(self.steps_per_sec / self.h100_bound, 3),
        }

    def _emit_locked(self) -> None:
        head = self._headline()
        if head is None:
            return
        flops = self.details.get("hlo_flops_per_step")
        if flops:
            self.details["mfu_vs_v5e_bf16_peak"] = (
                flops * self.steps_per_sec / V5E_BF16_PEAK_FLOPS
            )
        self.details["train_steps_per_sec"] = self.steps_per_sec
        self.details["train_step_ms"] = 1000.0 / self.steps_per_sec
        print(json.dumps(self.details), file=sys.stderr, flush=True)
        print(json.dumps(head), flush=True)
        self._emitted_any = True
        if not self.persist:
            return
        try:
            # Regression guard (ADVICE r4): "last good" is the fallback the
            # driver replays when a future run measures nothing — one
            # contended-chip run must not replace a healthy snapshot with an
            # 8x-degraded number.  Persist only if the new headline is at
            # least half the recorded one (or there is no record).  The
            # honest current measurement is still emitted to stdout above;
            # only the durable fallback is protected.
            try:
                prev = json.loads(_LAST_GOOD.read_text())["headline"]["value"]
            except (OSError, ValueError, KeyError, TypeError):
                prev = None
            if prev is not None and head["value"] < 0.5 * prev:
                _log(
                    f"last-good NOT updated: {head['value']:.1f} < 50% of "
                    f"recorded {prev:.1f} (likely contended run)"
                )
                return
            _RESULTS_DIR.mkdir(parents=True, exist_ok=True)
            tmp = _LAST_GOOD.with_suffix(".tmp")
            tmp.write_text(
                json.dumps({"headline": head, "details": self.details}, indent=1)
            )
            tmp.replace(_LAST_GOOD)
        except OSError as e:
            _log(f"last-good persist failed: {e}")

    def emit_fallback_if_empty(self, reason: str) -> None:
        """Nothing measured this run: replay the tracked last-good record.

        Must never raise — it runs on the watchdog thread, and an exception
        here would kill the thread before its os._exit, reproducing the
        round-2 evidence loss this file exists to prevent.
        """
        with self._lock:
            if self._emitted_any:
                return
            # the WHOLE body is guarded: even a stdout failure (e.g.
            # BrokenPipeError when the parent driver died — a plausible
            # companion to the wedge scenarios this code exists for) must
            # return control to the watchdog so its os._exit still runs
            try:
                rec = json.loads(_LAST_GOOD.read_text())
                headline = rec["headline"]
                details = dict(rec.get("details", {}))
                details.update({"fallback": True, "fallback_reason": reason})
                print(json.dumps(details), file=sys.stderr, flush=True)
                print(json.dumps(headline), flush=True)
                self._emitted_any = True
            except Exception as e:
                try:
                    _log(f"fallback emission failed ({reason}): {e}")
                except Exception:
                    pass


def _start_watchdog(emitter: Emitter, deadline_s: float) -> threading.Event:
    """Force-exit at the hard deadline, emitting best-so-far (or fallback).

    os._exit is deliberate: a wedged tunnel RPC blocks in C and never
    returns to Python, so a cooperative shutdown cannot be relied on.
    """
    done = threading.Event()

    def _watch():
        if done.wait(timeout=deadline_s):
            return
        # the force-exit is UNCONDITIONAL (finally): any exception on this
        # thread before os._exit would leave the wedged process hanging
        # forever — the exact evidence loss this watchdog exists to prevent
        try:
            _log(f"DEADLINE {deadline_s:.0f}s reached — force-exiting with best-so-far")
            emitter.emit_fallback_if_empty("deadline before first measurement")
            sys.stdout.flush()
            sys.stderr.flush()
        finally:
            # rc 0 only when SOME result (measured or fallback) was emitted;
            # a totally empty run must fail loudly, not masquerade as success
            os._exit(0 if emitter._emitted_any else 3)

    t = threading.Thread(target=_watch, daemon=True, name="bench-watchdog")
    t.start()
    return done


def _remaining(deadline_s: float) -> float:
    return deadline_s - (time.monotonic() - _T0)


def main():
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "480"))

    h100_bound = H100_BOUND_FALLBACK_STEPS_PER_SEC
    torch_cpu = None
    baseline_path = _RESULTS_DIR / "torch_cpu_baseline.json"
    if baseline_path.exists():
        b = json.loads(baseline_path.read_text())
        h100_bound = float(b.get("h100_steps_per_sec_bound", h100_bound))
        torch_cpu = b.get("torch_cpu_steps_per_sec")

    emitter = Emitter(h100_bound)
    done = _start_watchdog(emitter, deadline_s)

    import jax

    if os.environ.get("BENCH_CPU"):
        # env JAX_PLATFORMS alone is NOT enough: sitecustomize re-registers
        # the axon TPU plugin via config.update (PERFORMANCE.md backend
        # quirks) — a casual CPU smoke would otherwise grab the (likely
        # claimed) chip and contend with the queue
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: chip compiles of the flagship step run
    # 170-580 s through the remote compile helper; if the backend supports
    # executable serialization this makes repeat benches (e.g. the
    # round-end driver run after a bench_validate) near-instant, and if
    # not it is a no-op with a one-line warning
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent / ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    # a CPU debug run must never overwrite the chip's last-good fallback
    if jax.devices()[0].platform == "cpu" and not os.environ.get("BENCH_PERSIST"):
        emitter.persist = False
        _log("cpu backend: last-good persistence disabled (set BENCH_PERSIST=1 to force)")

    from sciml_pde_tpu.eval.rollout import rollout_predict
    from sciml_pde_tpu.models import FNO2d
    from sciml_pde_tpu.parallel import make_mesh, replicate, shard_batch
    from sciml_pde_tpu.train.fno_train import build_baseline_step
    from sciml_pde_tpu.train.optim import make_optimizer

    # bf16 spectral contractions are the SHIPPED default (ops/spectral.py:
    # the round-4 accuracy gate PASSED — committed evidence in
    # experiments/results/dft_precision_gate_summary_auto.json).  Here we
    # only (a) record the gate provenance in the details and (b) demote
    # back to exact f32 if a LOCAL re-run of the gate explicitly FAILED.
    # All required keys are validated BEFORE any precision change so a
    # malformed summary cannot flip precision without a record (ADVICE r4).
    gate_file = pathlib.Path(__file__).parent / "runs" / "dft_precision_gate" / "summary.json"
    if "SCIML_DFT_PRECISION" not in os.environ:
        try:
            gate = json.loads(gate_file.read_text())
            verdict = gate["verdict"]
            max_deg = max(gate["relative_degradation_r1_5"])
        except (OSError, ValueError, KeyError, TypeError):
            emitter.details["dft_precision"] = (
                "default (shipped default; committed r4 gate PASS)"
            )
        else:
            if verdict == "PASS":
                emitter.details["dft_precision"] = (
                    f"default (gate PASS, max degradation {max_deg*100:.2f}%)"
                )
            else:
                from sciml_pde_tpu.ops.spectral import set_dft_precision

                set_dft_precision("highest")
                emitter.details["dft_precision"] = (
                    f"highest (local gate verdict {verdict!r} — bf16 demoted)"
                )
                _log("bf16-dft demoted to f32 (local gate verdict %r)" % verdict)

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
    emitter.details.update(
        {
            "device": str(jax.devices()[0]),
            "n_devices": len(jax.devices()),
            "batch": BATCH,
            "h100_bound_steps_per_sec": h100_bound,
            "vs_baseline_denominator": (
                "analytic H100 launch-bound estimate "
                "(experiments/torch_baseline.py; no H100 on this host) — "
                "torch_cpu_steps_per_sec is the only measured torch datum"
            ),
            "torch_cpu_steps_per_sec": torch_cpu,
            "deadline_s": deadline_s,
        }
    )

    # ---- phase 1: compile + warmup --------------------------------------
    t0 = time.perf_counter()
    for _ in range(3):
        params, opt_state, loss, g_norm = step_fn(params, opt_state, data, grid_r, bidx, key)
    float(loss)
    _log(f"train-step compile+warmup: {time.perf_counter()-t0:.1f}s")
    emitter.details["timing"] = "value-fetch-forced (block_until_ready can return early on this backend)"

    # ---- phase 2: FIRST measurement window — emit headline ASAP ---------
    # BENCH_WINDOW_STEPS / BENCH_SCAN_K shrink the loops for smoke tests.
    # TIMING RULE for this backend: every window ends with a VALUE FETCH
    # (float(loss)), never bare block_until_ready — readiness notifications
    # on the tunneled runtime can return before execution completes
    # (measured: "1M steps/s" scans; PERFORMANCE.md round-3 timing audit),
    # but a device->host scalar fetch cannot lie.
    win_steps = int(os.environ.get("BENCH_WINDOW_STEPS", "200"))
    n_steps = min(100, win_steps)
    t0 = time.perf_counter()
    for s in range(n_steps):
        params, opt_state, loss, g_norm = step_fn(
            params, opt_state, data, grid_r, bidx_pool[s % len(bidx_pool)], key
        )
    float(loss)  # forces true completion of the whole chain
    first_rate = n_steps / (time.perf_counter() - t0)
    _log(f"first window: {first_rate:.1f} steps/s — emitting headline")
    emitter.update(
        first_rate,
        dispatch_steps_per_sec=first_rate,
        dispatch_steps_per_sec_windows=[round(first_rate, 1)],
        final_loss=float(loss),
    )

    # ---- phase 3: four more windows -> median ---------------------------
    rates = [first_rate]
    n_steps = win_steps
    for w in range(4):
        if _remaining(deadline_s) < 60:
            _log("skipping remaining dispatch windows (budget)")
            break
        t0 = time.perf_counter()
        for s in range(n_steps):
            params, opt_state, loss, g_norm = step_fn(
                params, opt_state, data, grid_r, bidx_pool[s % len(bidx_pool)], key
            )
        float(loss)  # value fetch: see timing rule above
        rates.append(n_steps / (time.perf_counter() - t0))
    dispatch_steps_per_sec = float(np.median(rates))
    _log(f"per-dispatch windows {[round(r,1) for r in rates]} steps/s, median {dispatch_steps_per_sec:.1f}")
    emitter.update(
        dispatch_steps_per_sec,
        dispatch_steps_per_sec=dispatch_steps_per_sec,
        dispatch_steps_per_sec_windows=[round(r, 1) for r in rates],
        final_loss=float(loss),
    )

    # ---- phase 4: HLO flops -> MFU (cheap if the compile cache is warm) --
    if _remaining(deadline_s) > 120:
        try:
            lowered = step_fn.lower(params, opt_state, data, grid_r, bidx, key)
            cost = lowered.compile().cost_analysis()
            if cost:
                c = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = float(c.get("flops", 0.0)) or None
                if flops:
                    emitter.update(hlo_flops_per_step=flops)
                    _log(f"hlo flops/step {flops:.3e}, mfu {emitter.details.get('mfu_vs_v5e_bf16_peak')}")
        except Exception as e:  # cost analysis is backend-dependent
            _log(f"cost_analysis unavailable: {e}")
    else:
        _log("skipping cost analysis (budget)")

    # ---- phase 5: scan-chunked loop: K optimizer steps per dispatch -----
    # The production train-loop shape on TPU (the whole loop lives in one
    # compiled program), robust to the tunnel's dispatch-rate throttle
    # that dominates per-dispatch numbers at this small shape
    # (PERFORMANCE.md).  Steps are identical optimizer steps over distinct
    # window-index batches.
    K = int(os.environ.get("BENCH_SCAN_K", "100"))
    if _remaining(deadline_s) > 150:
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
        float(losses[-1])
        _log(f"scan-chunk compile+first: {time.perf_counter()-t0:.1f}s")
        scan_rates = []
        n_chunks = 5
        for w in range(5):
            if _remaining(deadline_s) < 45 and scan_rates:
                break
            t0 = time.perf_counter()
            for c in range(n_chunks):
                params, opt_state, losses, _ = step_fn.scan(
                    params, opt_state, data, grid_r, chunk_pool[c % len(chunk_pool)], key
                )
            float(losses[-1])  # value fetch: see timing rule above
            scan_rates.append(n_chunks * K / (time.perf_counter() - t0))
        if scan_rates:
            scan_steps_per_sec = float(np.median(scan_rates))
            _log(
                f"scan-chunk(K={K}) windows {[round(r,1) for r in scan_rates]} "
                f"steps/s, median {scan_steps_per_sec:.1f}"
            )
            emitter.update(
                scan_steps_per_sec,
                candidate="scan",
                scan_chunk=K,
                scan_steps_per_sec=scan_steps_per_sec,
                scan_steps_per_sec_windows=[round(r, 1) for r in scan_rates],
                final_loss=float(losses[-1]),
            )

        # adaptive big chunk: when the K-step dispatch time is dominated
        # by tunnel RPC latency / dispatch-rate throttling (rate implies
        # > 1 ms of per-dispatch overhead), K10 = 10K steps per dispatch
        # amortizes it away — and is the true production loop shape (the
        # trainers run epoch-scale scans).  Honest: every step is still a
        # full optimizer step over a distinct window batch.
        K10 = K * 10
        # trigger when one K-chunk completes in < 0.5 s: at that scale a
        # ~100-300 ms tunnel round-trip is a material fraction of the
        # measurement and K10 amortizes it
        if (
            scan_rates
            and _remaining(deadline_s) > 120
            and K / scan_steps_per_sec < 0.5
        ):
            big = jnp.asarray(
                np.stack(
                    [
                        rng.integers(0, n_traj, (K10, BATCH)),
                        rng.integers(0, n_frames - INITIAL_STEP - 1, (K10, BATCH)),
                    ],
                    axis=2,
                ).astype(np.int32)
            )
            t0 = time.perf_counter()
            params, opt_state, losses, _ = step_fn.scan(
                params, opt_state, data, grid_r, big, key
            )
            float(losses[-1])
            _log(f"scan-chunk(K={K10}) compile+first: {time.perf_counter()-t0:.1f}s")
            big_rates = []
            for w in range(3):
                if _remaining(deadline_s) < 60 and big_rates:
                    break
                t0 = time.perf_counter()
                params, opt_state, losses, _ = step_fn.scan(
                    params, opt_state, data, grid_r, big, key
                )
                float(losses[-1])  # value fetch: see timing rule above
                big_rates.append(K10 / (time.perf_counter() - t0))
            if big_rates:
                big_median = float(np.median(big_rates))
                _log(
                    f"scan-chunk(K={K10}) windows {[round(r,1) for r in big_rates]} "
                    f"steps/s, median {big_median:.1f}"
                )
                emitter.update(
                    big_median,
                    candidate="scan_big",
                    scan_big_chunk=K10,
                    scan_big_steps_per_sec=big_median,
                    scan_big_steps_per_sec_windows=[round(r, 1) for r in big_rates],
                )
    else:
        _log("skipping scan-chunk phase (budget)")

    # ---- phase 5f: fused Pallas step (ops/fno_fused_step.py) ------------
    # The whole model runs per batch element inside VMEM (5 pallas_calls)
    # and the optimizer is ~12 ops on one flat parameter vector — same
    # math as the production step (asserted step-for-step on CPU in
    # tests/test_fast_step.py), far fewer/larger ops.  Guarded twice:
    # try/except for Python-level failures, and — because a Mosaic
    # lowering abort is a SIGABRT that no except can catch (round-4
    # post-mortem) — the phase only runs at all when the on-chip smoke
    # gate (experiments/tpu_smoke.py) has recorded a PASS for these
    # kernels on this filesystem.  SCIML_BENCH_FUSED=1 overrides.
    def _fused_gate_ok() -> bool:
        if os.environ.get("SCIML_BENCH_FUSED") == "1":
            return True
        if jax.devices()[0].platform == "cpu":
            return True  # interpreter mode cannot SIGABRT
        try:
            smoke = json.loads(
                (pathlib.Path(__file__).parent / "experiments" / "results"
                 / "tpu_smoke.json").read_text()
            )
            return smoke.get("verdict") == "PASS"
        except (OSError, ValueError):
            return False

    if _remaining(deadline_s) > 150 and not _fused_gate_ok():
        _log("skipping fused phase (no on-chip smoke-gate PASS recorded — "
             "a Mosaic abort would kill the bench process)")
    elif _remaining(deadline_s) > 150:
        try:
            from sciml_pde_tpu.train.fast_step import (
                build_fast_baseline_step,
                fast_state_from_tree,
                init_opt,
            )

            theta, spec = fast_state_from_tree(params, 12)
            fstep, fscan = build_fast_baseline_step(
                12, INITIAL_STEP, spec, 1e-3, 10_000
            )
            grid2 = jnp.transpose(grid, (2, 0, 1))
            opt_f = init_opt(theta)
            # K=200 matches experiments/perf_probe.py's fused configs
            # EXACTLY (same shapes, same program): the probe's compile is
            # then a remote-compile-cache hit here, so the fused phase
            # fits the driver bench's deadline despite 10-20 min cold
            # Mosaic compiles
            Kf = int(os.environ.get("BENCH_SCAN_K", "200"))
            chunk = jnp.asarray(
                np.stack(
                    [
                        rng.integers(0, n_traj, (Kf, BATCH)),
                        rng.integers(0, n_frames - INITIAL_STEP - 1, (Kf, BATCH)),
                    ],
                    axis=2,
                ).astype(np.int32)
            )
            t0 = time.perf_counter()
            theta, opt_f, losses_f, _ = fscan(theta, opt_f, data, grid2, chunk)
            lf = float(losses_f[-1])
            _log(f"fused scan compile+first: {time.perf_counter()-t0:.1f}s (loss {lf:.4f})")
            if not np.isfinite(lf):
                raise FloatingPointError(f"fused step loss not finite: {lf}")
            fused_rates = []
            for w in range(5):
                if _remaining(deadline_s) < 60 and fused_rates:
                    break
                t0 = time.perf_counter()
                for _ in range(5):
                    theta, opt_f, losses_f, _ = fscan(
                        theta, opt_f, data, grid2, chunk
                    )
                float(losses_f[-1])  # value fetch: see timing rule above
                fused_rates.append(5 * Kf / (time.perf_counter() - t0))
            if fused_rates and np.isfinite(float(losses_f[-1])):
                fused_sps = float(np.median(fused_rates))
                _log(
                    f"fused scan windows {[round(r,1) for r in fused_rates]} "
                    f"steps/s, median {fused_sps:.1f}"
                )
                emitter.update(
                    fused_sps,
                    candidate="scan_fused",
                    fused_scan_steps_per_sec=fused_sps,
                    fused_scan_steps_per_sec_windows=[round(r, 1) for r in fused_rates],
                    fused_final_loss=float(losses_f[-1]),
                )
        except Exception as e:
            _log(f"fused phase unavailable (non-fatal): {type(e).__name__}: {e}")
    else:
        _log("skipping fused phase (budget)")

    # ---- phase 6: 100-step rollout wall-clock ---------------------------
    if _remaining(deadline_s) > 90:
        xb = jnp.asarray(
            rng.normal(size=(BATCH, NX, NY, INITIAL_STEP, CHANNELS)).astype(np.float32)
        )
        gb = jnp.broadcast_to(grid[None], (BATCH, NX, NY, 2))
        ro = jax.jit(
            lambda p, x, g: rollout_predict(
                lambda a, b: model.apply({"params": p}, a, b), x, g, 100
            )
        )
        t0 = time.perf_counter()
        float(jnp.sum(ro(params, xb, gb)))  # compile + forced completion
        _log(f"rollout compile: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        float(jnp.sum(ro(params, xb, gb)))  # value fetch: see timing rule
        rollout_s = time.perf_counter() - t0
        emitter.update(
            rollout100_wall_s=rollout_s,
            rollout100_steps_per_sec=100.0 / rollout_s,
        )
    else:
        _log("skipping rollout phase (budget)")

    # ---- phase 7 (LAST): batch-64 scan MFU (utilization headroom) -------
    # The flagship shape is the reference's batch 4 — tiny for the MXU.
    # This phase shows what the same step does at batch 64 (weak-scaling
    # shape from DESIGN.md's cost model).  Informational: it never sets
    # the headline, and it runs LAST because step_fn.scan donates
    # params/opt_state — if it dies mid-execution (e.g. OOM at 16x the
    # batch) the donated buffers are gone, so nothing may run after it.
    B64 = 64
    if _remaining(deadline_s) > 150:
        idx64 = jnp.asarray(
            np.stack(
                [
                    rng.integers(0, n_traj, (K, B64)),
                    rng.integers(0, n_frames - INITIAL_STEP - 1, (K, B64)),
                ],
                axis=2,
            ).astype(np.int32)
        )
        try:
            t0 = time.perf_counter()
            p64, o64, l64, _ = step_fn.scan(
                params, opt_state, data, grid_r, idx64, key
            )
            float(l64[-1])
            _log(f"batch64 scan compile+first: {time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            p64, o64, l64, _ = step_fn.scan(p64, o64, data, grid_r, idx64, key)
            float(l64[-1])  # value fetch: see timing rule above
            rate64 = K / (time.perf_counter() - t0)
            flops = emitter.details.get("hlo_flops_per_step")
            upd = {"batch64_scan_steps_per_sec": rate64}
            if flops:
                # per-step flops scale ~linearly in batch (gather+fwd+bwd
                # dominate; optimizer is batch-independent) — conservative
                upd["mfu_batch64_vs_v5e_bf16_peak"] = (
                    flops * (B64 / BATCH) * rate64 / V5E_BF16_PEAK_FLOPS
                )
            emitter.update(**upd)
            _log(f"batch64 scan {rate64:.1f} steps/s, mfu64 {upd.get('mfu_batch64_vs_v5e_bf16_peak')}")
        except Exception as e:
            _log(f"batch64 phase failed (non-fatal, nothing follows): {e}")
    else:
        _log("skipping batch64 phase (budget)")

    done.set()
    _log("all phases complete")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit whatever evidence exists before dying
        _log(f"FATAL {type(e).__name__}: {e}")
        raise
