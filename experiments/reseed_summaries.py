"""Reseed ``runs/*/summary.json`` from tracked snapshots after an fs recycle.

The driver environment recycles the filesystem between sessions: generated
data, checkpoints, and ``runs/`` are wiped, while git-tracked snapshots under
``experiments/results/`` survive.  Queue scripts guard long chip jobs on
summary keys (``summary_has runs/X/summary.json KEY``), so a recycled
summary would re-run experiments whose results already landed.  This script
restores each run summary by merging its tracked snapshots back in.

Merge semantics: snapshots are applied in list order (oldest first), and any
key already present in the live ``runs/`` summary always wins — so re-running
this after an experiment wrote fresh keys is safe and restores only the
history lost to the recycle.  Idempotent; run it at session start and after
any experiment that rewrites its summary from a pre-recycle read.
"""
from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SNAP = REPO / "experiments" / "results"
RUNS = REPO / "runs"

# (snapshot filename, run dir) — applied in order; later snapshots and the
# live summary override earlier snapshots key-by-key.
MAP = [
    ("ns_production_summary_r2.json", "ns_production"),
    ("ns_production_summary_r2b.json", "ns_production"),
    ("ns_production_summary_r2c.json", "ns_production"),
    ("ns_production_summary_r2d.json", "ns_production"),
    ("ns_transformer_summary_r2.json", "ns_transformer"),
    ("ns_transformer_summary_r2b.json", "ns_transformer"),
    ("plume3d_parity_summary_r2.json", "plume3d_parity"),
    ("dr_parity_ds128.json", "dr_parity_ds128"),
    ("dr_parity_ds64.json", "dr_parity_ds64"),
    ("dr_parity_ds8.json", "dr_parity_ds8"),
    ("comparison_dr_protocol_r2.json", "comparison_dr"),
    ("bvp_study_100k_r2.json", "bvp_study"),
    ("airfoil_flow_r2.json", "airfoil_flow"),
    # auto-snapshots (experiments/snapshot_watch.py) come last: they are the
    # freshest capture of each run summary and win over the manual ones
    ("ns_production_summary_auto.json", "ns_production"),
    ("ns_transformer_summary_auto.json", "ns_transformer"),
    ("dr_parity_ds128_summary_auto.json", "dr_parity_ds128"),
    ("dr_parity_ds256_summary_auto.json", "dr_parity_ds256"),
    ("dr_parity_ds8_summary_auto.json", "dr_parity_ds8"),
    ("dr_parity_ds32_summary_auto.json", "dr_parity_ds32"),
    ("dr_transformer_summary_auto.json", "dr_transformer"),
    ("plume3d_parity_summary_auto.json", "plume3d_parity"),
    ("ns_lie_toy_summary_auto.json", "ns_lie_toy"),
]


def reseed() -> None:
    merged: dict[str, dict] = {}
    for snap_name, run_dir in MAP:
        snap_path = SNAP / snap_name
        if not snap_path.exists():
            continue
        merged.setdefault(run_dir, {}).update(json.loads(snap_path.read_text()))
    for run_dir, snap_keys in merged.items():
        out = RUNS / run_dir / "summary.json"
        live = json.loads(out.read_text()) if out.exists() else {}
        restored = {**snap_keys, **live}
        new_keys = sorted(set(restored) - set(live))
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(restored, indent=1))
        print(f"{out}: +{new_keys} (live keys kept: {sorted(live)})")


if __name__ == "__main__":
    reseed()
