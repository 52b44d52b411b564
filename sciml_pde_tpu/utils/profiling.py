"""Profiling / tracing hooks.

The reference's only profiling is the phiflow backend profiler
(sim_ns_incomp_2d.py:239-241) and /usr/bin/time in run_sim.sh.  Here
profiling is first-class (SURVEY.md section 5): a ``jax.profiler`` trace
context for TensorBoard/XProf, and a step timer whose north star is
steps/sec/chip.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a device trace viewable in TensorBoard / xprof."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec with warmup discard."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = 0
        self.t0 = None

    def tick(self):
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self.t0 is None or self.count <= self.warmup:
            return float("nan")
        return (self.count - self.warmup) / (time.perf_counter() - self.t0)
