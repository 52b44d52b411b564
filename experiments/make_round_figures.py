"""Round figures: our rollout curves overlaid on the published tables.

One panel per benchmark (2D DR FNO, 2D NS FNO, 2D DR Transformer, plus 3D
NS FNO / 2D NS Transformer when their run summaries exist).  Encoding:
color identifies the model VARIANT (baseline = blue, aux = orange — color
follows the entity), linestyle identifies the SOURCE (published = dashed,
this framework = solid), so each panel carries two hues and stays
CVD-safe; the grid/axes are recessive and every series is legend-named.

Re-runnable: panels whose result files are missing are skipped.
"""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from sciml_pde_tpu.plots.paper_tables import ROLLOUT_NRMSE

BLUE, ORANGE = "#2a78d6", "#eb6834"  # categorical slots 1-2 (validated)
INK, MUTED = "#0b0b0b", "#52514e"


def _load(path, *keys, fallback=None):
    """Read nested keys from ``path``, else from ``fallback`` — the live
    run summary wins, the tracked experiments/results snapshot (which
    survives the periodic filesystem recycles) backs it up."""
    p = Path(path)
    if not p.exists():
        if fallback is not None:
            return _load(fallback, *keys)
        return None
    d = json.loads(p.read_text())
    for k in keys:
        if d is None or k not in d:
            if fallback is not None:
                return _load(fallback, *keys)
            return None
        d = d[k]
    return d


def _load_best(path, variants, *keys, fallback=None):
    """Try each variant key in order (strongest result first) against the
    live summary, then against the snapshot fallback."""
    for v in variants:
        got = _load(path, v, *keys)
        if got is not None:
            return got
    if fallback is not None:
        return _load_best(fallback, variants, *keys)
    return None


def rollout_panel(ax, pub, ours_base, ours_aux, title, note=""):
    steps = range(1, 6)
    ax.plot(steps, pub["baseline"], "--o", color=BLUE, lw=2, ms=6,
            label="baseline (published)")
    ax.plot(steps, pub["aux"], "--o", color=ORANGE, lw=2, ms=6,
            label="aux (published)")
    if ours_base:
        ax.plot(steps[: len(ours_base)], ours_base, "-s", color=BLUE, lw=2,
                ms=7, label="baseline (ours)")
    if ours_aux:
        ax.plot(steps[: len(ours_aux)], ours_aux, "-s", color=ORANGE, lw=2,
                ms=7, label="aux (ours)")
    ax.set_title(title, color=INK, fontsize=11)
    ax.set_xlabel("rollout step", color=MUTED)
    ax.set_ylabel("nRMSE", color=MUTED)
    ax.set_xticks(list(steps))
    ax.grid(True, color="#e6e5e0", lw=0.6)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.tick_params(colors=MUTED)
    ax.legend(fontsize=8, frameon=False)
    if note:
        ax.text(0.02, 0.98, note, transform=ax.transAxes, fontsize=7,
                va="top", color=MUTED)


PANELS = [
    dict(
        key=("2D_DR", "FNO"),
        title="2D diffusion-reaction, FNO (ds128)",
        base=lambda: _load("experiments/results/dr_parity_ds128.json",
                           "baseline", "rollout_nrmse"),
        aux=lambda: _load("experiments/results/dr_parity_ds128.json",
                          "aux", "rollout_nrmse"),
        note="ours: self-generated data, largest preset run so far",
    ),
    dict(
        key=("2D_NS", "FNO"),
        title="2D incompressible NS, FNO (256²)",
        base=lambda: (_load_best("runs/ns_production/summary.json",
                                 ["baseline_ds32", "baseline_refbatch"],
                                 "rollout_nrmse",
                                 fallback="experiments/results/ns_production_summary_r2d.json")
                      or _load("experiments/results/ns_production_summary_r2.json",
                               "baseline", "rollout_nrmse")),
        aux=lambda: (_load_best("runs/ns_production/summary.json",
                                ["aux_ds32", "aux_p2", "aux_refbatch"],
                                "rollout_nrmse",
                                fallback="experiments/results/ns_production_summary_r2c.json")
                     or _load("experiments/results/ns_production_summary_r2.json",
                              "aux", "rollout_nrmse")),
        note="ours: reference batch sizes; strongest landed preset per variant",
    ),
    dict(
        key=("2D_DR", "Transformer"),
        title="2D diffusion-reaction, Transformer (ds8)",
        base=lambda: _load("runs/dr_transformer_r2/convention_eval.json",
                           "baseline", "joint_all",
                           fallback="experiments/results/dr_convention_eval_r2.json"),
        aux=lambda: _load("runs/dr_transformer_r2/convention_eval.json",
                          "aux", "joint_all",
                          fallback="experiments/results/dr_convention_eval_r2.json"),
        note="published joint/all-steps nRMSE convention",
    ),
    dict(
        key=("3D_NS", "FNO"),
        title="3D incompressible NS plume, FNO",
        base=lambda: _load("runs/plume3d_parity/summary.json",
                           "baseline", "rollout_nrmse",
                           fallback="experiments/results/plume3d_parity_summary_r2.json"),
        aux=lambda: _load("runs/plume3d_parity/summary.json",
                          "aux", "rollout_nrmse",
                          fallback="experiments/results/plume3d_parity_summary_r2.json"),
    ),
    dict(
        key=("2D_NS", "Transformer"),
        title="2D incompressible NS, Transformer",
        base=lambda: _load("runs/ns_transformer/summary.json",
                           "ns_baseline", "rollout_nrmse_allsteps",
                           fallback="experiments/results/ns_transformer_summary_r2.json"),
        aux=lambda: _load_best("runs/ns_transformer/summary.json",
                               ["ns_aux_ext", "ns_aux"], "rollout_nrmse_allsteps",
                               fallback="experiments/results/ns_transformer_summary_r2b.json"),
    ),
]


def main(out_dir="runs/figures"):
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    made = []
    for p in PANELS:
        task, model = p["key"]
        pub = ROLLOUT_NRMSE.get(task, {}).get(model)
        if pub is None:
            continue
        ours_b, ours_a = p["base"](), p["aux"]()
        if ours_b is None and ours_a is None:
            continue
        fig, ax = plt.subplots(figsize=(5, 3.8), facecolor="white")
        rollout_panel(ax, pub, ours_b, ours_a, p["title"], p.get("note", ""))
        fig.tight_layout()
        f = out / f"rollout_{task}_{model}.png".lower()
        fig.savefig(f, dpi=150)
        plt.close(fig)
        made.append(str(f))
    print(json.dumps(made, indent=1))
    return made


if __name__ == "__main__":
    main()
