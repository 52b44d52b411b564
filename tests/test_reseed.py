"""Reseed tool: runs/*/summary.json restoration from tracked snapshots.

The queue scripts guard multi-hour chip jobs on summary keys; after a
filesystem recycle those summaries are gone and every guard would re-run
already-landed experiments.  ``experiments/reseed_summaries.py`` restores
them — these tests pin its merge semantics (live keys win, snapshots apply
in list order, idempotent).
"""

import json

import experiments.reseed_summaries as rs


def _setup(tmp_path, monkeypatch):
    snap = tmp_path / "snapshots"
    runs = tmp_path / "runs"
    snap.mkdir()
    monkeypatch.setattr(rs, "SNAP", snap)
    monkeypatch.setattr(rs, "RUNS", runs)
    return snap, runs


def test_restores_missing_summary(tmp_path, monkeypatch):
    snap, runs = _setup(tmp_path, monkeypatch)
    (snap / "ns_production_summary_r2.json").write_text(
        json.dumps({"baseline": {"rollout_nrmse": [0.05]}})
    )
    rs.reseed()
    out = json.loads((runs / "ns_production" / "summary.json").read_text())
    assert out["baseline"]["rollout_nrmse"] == [0.05]


def test_live_keys_win_and_later_snapshots_override_earlier(tmp_path, monkeypatch):
    snap, runs = _setup(tmp_path, monkeypatch)
    # two snapshots for the same run dir: r2c (later in MAP) overrides r2
    (snap / "ns_production_summary_r2.json").write_text(
        json.dumps({"aux": {"v": "old"}, "baseline": {"v": "r2"}})
    )
    (snap / "ns_production_summary_r2c.json").write_text(
        json.dumps({"aux": {"v": "new"}})
    )
    live_dir = runs / "ns_production"
    live_dir.mkdir(parents=True)
    (live_dir / "summary.json").write_text(
        json.dumps({"baseline": {"v": "live"}})
    )
    rs.reseed()
    out = json.loads((live_dir / "summary.json").read_text())
    assert out["baseline"]["v"] == "live"  # live beats every snapshot
    assert out["aux"]["v"] == "new"        # later snapshot beats earlier


def test_idempotent(tmp_path, monkeypatch):
    snap, runs = _setup(tmp_path, monkeypatch)
    (snap / "dr_parity_ds128.json").write_text(json.dumps({"aux": {"r1": 1}}))
    rs.reseed()
    first = (runs / "dr_parity_ds128" / "summary.json").read_text()
    rs.reseed()
    assert (runs / "dr_parity_ds128" / "summary.json").read_text() == first


def test_map_snapshots_exist_in_repo():
    # every MAP entry should point at a tracked snapshot (a typo here would
    # silently skip a reseed and let a guard re-run a landed experiment);
    # *_auto.json entries are exempt — snapshot_watch.py creates them only
    # once their run lands new keys
    missing = [
        s for s, _ in rs.MAP
        if not s.endswith("_auto.json") and not (rs.SNAP / s).exists()
    ]
    assert not missing, missing
