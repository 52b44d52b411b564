"""Auto-snapshot daemon: persist landing run summaries to tracked files.

Long chip jobs land their tables in ``runs/*/summary.json``, which the
driver environment wipes at session boundaries; only git-tracked files under
``experiments/results/`` survive.  Earlier sessions snapshotted by hand and
twice lost a landed row to an unexpected recycle (e.g. the refbatch baseline
row had to be re-transcribed from RESULTS.md).  This watcher closes the gap:
every ``--interval`` seconds it compares each watched summary against the
union of its tracked snapshots (the reseed MAP + its own ``*_auto.json``)
and, when new keys have landed, writes ``<run>_summary_auto.json`` and
commits it (retrying if another git process holds the index).

Run it in the background for the life of a session::

    nohup python experiments/snapshot_watch.py > runs/queue6/snapshot.log 2>&1 &
"""
from __future__ import annotations

import argparse
import json
import subprocess
import time
from pathlib import Path

from experiments.reseed_summaries import MAP, RUNS, SNAP

WATCH = [
    "ns_production", "ns_transformer", "dr_parity_ds128", "dr_parity_ds256",
    # round-3 additions: v52 queue targets + the lie toy study
    "dr_parity_ds8", "dr_parity_ds32", "dr_transformer", "plume3d_parity",
    "ns_lie_toy",
    # round-4: the bf16-dft accuracy gate verdict (bench.py reads it)
    "dft_precision_gate",
]


def known_keys(run_dir: str) -> set[str]:
    keys: set[str] = set()
    for snap_name, rd in MAP:
        if rd == run_dir and (SNAP / snap_name).exists():
            keys |= set(json.loads((SNAP / snap_name).read_text()))
    auto = SNAP / f"{run_dir}_summary_auto.json"
    if auto.exists():
        keys |= set(json.loads(auto.read_text()))
    return keys


def git_commit(paths: list[str], msg: str, repo: Path, retries: int = 5) -> bool:
    for _ in range(retries):
        add = subprocess.run(["git", "-C", str(repo), "add", *paths],
                             capture_output=True, text=True)
        if add.returncode == 0:
            com = subprocess.run(
                ["git", "-C", str(repo), "commit", "-m", msg],
                capture_output=True, text=True,
            )
            if com.returncode == 0:
                return True
            if "nothing to commit" in com.stdout + com.stderr:
                return True
        time.sleep(7)  # another git process may hold .git/index.lock
    return False


def sweep(repo: Path) -> list[str]:
    committed = []
    for run_dir in WATCH:
        live_path = RUNS / run_dir / "summary.json"
        if not live_path.exists():
            continue
        try:
            live = json.loads(live_path.read_text())
        except (json.JSONDecodeError, OSError):
            continue  # mid-write; next sweep gets it
        fresh = sorted(set(live) - known_keys(run_dir))
        if not fresh:
            continue
        auto = SNAP / f"{run_dir}_summary_auto.json"
        snap = dict(live)
        snap["_provenance"] = (
            "auto-snapshot of runs/%s/summary.json (snapshot_watch.py); "
            "new keys at capture: %s" % (run_dir, fresh)
        )
        auto.write_text(json.dumps(snap, indent=1))
        msg = (f"Snapshot {run_dir} summary: {', '.join(fresh)} landed\n\n"
               f"No-Verification-Needed: tracked result snapshot only")
        if git_commit([str(auto)], msg, repo):
            committed.append(f"{run_dir}:{fresh}")
        print(f"[snapshot] {run_dir}: new keys {fresh}", flush=True)
    return committed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=int, default=300)
    ap.add_argument("--once", action="store_true")
    a = ap.parse_args()
    repo = Path(__file__).resolve().parent.parent
    while True:
        sweep(repo)
        if a.once:
            break
        time.sleep(a.interval)


if __name__ == "__main__":
    main()
