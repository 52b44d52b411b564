"""Scalar logging: JSONL file + stdout, wandb-compatible shape.

Replaces the reference's wandb logging (fno/train.py:206-213,331-337) in a
dependency-free way; includes the wall-clock ``sim_hours`` custom metric the
transformer trainers track (train_transformer_aux_ns.py:164-170).
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricLogger:
    def __init__(self, run_dir: str | Path, name: str = "train", echo_every: int = 1):
        self.dir = Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{name}.jsonl"
        self.t0 = time.time()
        self.echo_every = echo_every
        self._n = 0

    def log(self, step: int, **scalars):
        rec = {"step": step, "sim_hours": (time.time() - self.t0) / 3600.0}
        rec.update({k: float(v) for k, v in scalars.items()})
        with self.path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        self._n += 1
        if self._n % self.echo_every == 0:
            msg = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}" for k, v in rec.items())
            print(msg, flush=True)
