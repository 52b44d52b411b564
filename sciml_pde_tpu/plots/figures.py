"""Figure generators (rollout curves, motivation bars, field renders).

Capability parity with the reference's ``Plot Generator/`` scripts:
  - ``rollout_figure``: nRMSE vs rollout step, baseline vs aux
    (Plot Generator/rollout.py);
  - ``motivation_figure``: foundation models on full vs decomposed NS
    (motivation.py);
  - ``field_panels``: side-by-side prediction/target field renders for 2D DR
    / 2D NS (2D_DR_plot.py, 2D_NS_plot.py) and mid-slice renders for 3D
    (3D_NS_Vis.py);
  - ``data_efficiency_figure``: nRMSE vs simulation cost across basic_dsN
    presets with seed error bars (random_seed_ns.py).
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from sciml_pde_tpu.plots.paper_tables import (
    MOTIVATION_NRMSE,
    ROLLOUT_NRMSE,
    SIM_COST_SECONDS,
)


def rollout_figure(out_path: str | Path, task: str = "2D_NS", model: str = "FNO",
                   ours: list[float] | None = None):
    """nRMSE vs rollout step; ``ours`` (optional) overlays fresh results."""
    tab = ROLLOUT_NRMSE[task][model]
    steps = np.arange(1, len(tab["baseline"]) + 1)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(steps, tab["baseline"], "o-", label=f"{model} baseline")
    ax.plot(steps, tab["aux"], "s-", label=f"{model} + aux (paper)")
    if ours is not None:
        ax.plot(steps[: len(ours)], ours, "d--", label="ours (this run)")
    ax.set_xlabel("rollout step")
    ax.set_ylabel("nRMSE")
    ax.set_title(f"{task} {model} rollout")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return Path(out_path)


def motivation_figure(out_path: str | Path):
    m = MOTIVATION_NRMSE
    x = np.arange(len(m["models"]))
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar(x - 0.2, m["full"], width=0.4, label="full 2D NS")
    ax.bar(x + 0.2, m["decomposed_convection"], width=0.4, label="decomposed convection")
    ax.set_xticks(x, m["models"], rotation=45, ha="right")
    ax.set_ylabel("nRMSE")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return Path(out_path)


def field_panels(out_path: str | Path, pred: np.ndarray, target: np.ndarray,
                 channel: int = 0, title: str = ""):
    """2D field render: prediction vs target vs error, clim locked to the
    target (reference metrics.py:461-508 style)."""
    if pred.ndim == 4:  # 3D volume: take the mid z-slice (3D_NS_Vis.py)
        zmid = pred.shape[2] // 2
        pred, target = pred[:, :, zmid], target[:, :, zmid]
    p, t = pred[..., channel], target[..., channel]
    vmin, vmax = float(t.min()), float(t.max())
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (img, name) in zip(
        axes, [(p, "Prediction"), (t, "Data"), (p - t, "Error")]
    ):
        h = ax.imshow(img.T, origin="lower", aspect="auto",
                      vmin=vmin if name != "Error" else None,
                      vmax=vmax if name != "Error" else None)
        ax.set_title(name)
        fig.colorbar(h, ax=ax)
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return Path(out_path)


def data_efficiency_figure(out_path: str | Path, results: dict[str, list[float]],
                           labels: list[str] | None = None,
                           x: list[float] | None = None,
                           xlabel: str = "simulation cost (s)"):
    """nRMSE vs simulation cost; ``results`` maps curve name -> nRMSE per
    basic_dsN preset (mean over seeds); error bars from seed spread when a
    list of lists is given (random_seed_ns.py:30-39).  ``x`` overrides the
    default NS sim-cost axis (use when presets are a non-contiguous
    subset, where positional mapping would mislabel points); per-seed rows
    of uneven length are handled independently."""
    fig, ax = plt.subplots(figsize=(5, 4))
    cost = x if x is not None else SIM_COST_SECONDS
    for name, vals in results.items():
        vals = np.asarray(vals, dtype=object)
        if vals.ndim == 2 or isinstance(vals[0], (list, np.ndarray)):
            mean = np.asarray([np.mean(np.asarray(v, float)) for v in vals])
            std = np.asarray([np.std(np.asarray(v, float)) for v in vals])
            ax.errorbar(cost[: len(vals)], mean, yerr=std, label=name, marker="o")
        else:
            ax.plot(cost[: len(vals)], vals.astype(float), "o-", label=name)
    ax.set_xscale("log")
    ax.set_xlabel(xlabel)
    ax.set_ylabel("nRMSE")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return Path(out_path)


def field_animation(out_path: str | Path, frames: np.ndarray, channel: int = 0,
                    fps: int = 10, cmap: str = "viridis", title: str = ""):
    """Animated gif of a trajectory (reference data_gen/src/plots.py
    ``phi_plots``/gif writing): ``frames`` is (T, X, Y[, C]); one imshow
    per frame, shared color scale, written via PillowWriter."""
    from matplotlib import animation

    frames = np.asarray(frames)
    if frames.ndim == 4:
        frames = frames[..., channel]
    vmin, vmax = float(frames.min()), float(frames.max())
    fig, ax = plt.subplots(figsize=(4, 4))
    im = ax.imshow(frames[0].T, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_title(title)
    ax.axis("off")

    def update(i):
        im.set_data(frames[i].T)
        return (im,)

    ani = animation.FuncAnimation(fig, update, frames=len(frames), blit=True)
    ani.save(str(out_path), writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return Path(out_path)
