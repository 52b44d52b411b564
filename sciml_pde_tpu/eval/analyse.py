"""Result aggregation: metric pickles -> Results.csv.

Capability parity with ``pdebench/models/analyse_result_forward.py:158-198``:
glob ``*.pickle`` files (each a tuple of the six rollout metrics), parse the
filename into (pde, param, model) index columns, emit one CSV row per file
with the metric columns.
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np
import pandas as pd

METRIC_COLS = ["RMSE", "nRMSE", "CSV", "Max", "BD", "F"]


def parse_name(stem: str) -> dict:
    """'{pde}_{param}_{model}' convention; missing parts fall back."""
    parts = stem.split("_")
    return {
        "pde": parts[0] if parts else stem,
        "param": "_".join(parts[1:-1]) if len(parts) > 2 else "",
        "model": parts[-1] if len(parts) > 1 else "",
    }


def collect(results_dir: str | Path) -> pd.DataFrame:
    rows = []
    for p in sorted(Path(results_dir).glob("**/*.pickle")):
        with p.open("rb") as f:
            errs = pickle.load(f)
        vals = [float(np.asarray(v).mean()) for v in errs]
        row = parse_name(p.stem)
        row.update(dict(zip(METRIC_COLS, vals)))
        row["file"] = str(p)
        rows.append(row)
    return pd.DataFrame(rows).set_index(["pde", "param", "model"]) if rows else pd.DataFrame()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--results-dir", default=".")
    p.add_argument("--out", default="Results.csv")
    a = p.parse_args(argv)
    df = collect(a.results_dir)
    df.to_csv(a.out)
    print(f"{len(df)} results -> {a.out}")


if __name__ == "__main__":
    main()
