"""OFormer + Hyena comparison on the generated 2D DR dataset.

The repo-specific comparison study of the reference
(``OFormer Model Comparison/eval_oformer_rd2d.py``,
``Hyena Model Comparison/eval_hyena_rd2d.py``): flattened grid point
sets, autoregressive rollout, Rel-L2 / accumulated-MSE / final-step /
rollout-nRMSE reporting.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="data/")
    p.add_argument("--out", default="runs/comparison_dr")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--train-subsample", type=int, default=4)
    p.add_argument("--rollout", type=int, default=5)
    p.add_argument("--models", nargs="+", default=["oformer", "hyena"])
    a = p.parse_args(argv)

    from sciml_pde_tpu.comparisons.oformer_dr2d import (
        evaluate_comparison,
        run_comparison_training,
    )

    out = Path(a.out)
    out.mkdir(parents=True, exist_ok=True)
    summary_path = out / "summary.json"
    results = json.loads(summary_path.read_text()) if summary_path.exists() else {}
    for mt in a.models:
        t0 = time.time()
        res = run_comparison_training(
            base_path=a.data, model_type=mt, train_subsample=a.train_subsample,
            epochs=a.epochs, run_dir=str(out), model_name=f"{mt}_dr",
        )
        ev = evaluate_comparison(
            res.model, res.params, res.test_w, initial_step=10,
            rollout_steps=a.rollout,
        )
        results[mt] = {**{k: (list(v) if isinstance(v, (list, tuple)) else v)
                          for k, v in ev.items()},
                       "seconds": time.time() - t0}
        print(mt, results[mt], flush=True)
        summary_path.write_text(json.dumps(results, indent=1))
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
