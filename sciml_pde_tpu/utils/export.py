"""Serving export: AOT-compiled operator artifacts via ``jax.export``.

The reference has no deployment story (training scripts re-build the
torch module and load a ``state_dict`` everywhere, e.g.
``fno/train.py:136-139``).  For serving, a trained operator here is
exported ONCE as a serialized StableHLO artifact — params baked in,
shapes fixed, multi-platform (TPU + CPU fallback) — and reloaded
anywhere jax runs, with no model code, config, or checkpoint layout
needed at the serving site:

    art = export_apply(lambda x, g: model.apply({"params": p}, x, g),
                       (x_example, grid_example))
    save_exported(art, "fno_dr.stablehlo")
    ...
    serve = load_exported("fno_dr.stablehlo")   # -> callable
    y = serve(x, grid)

Rollout serving: pass ``apply_fn`` wrapped in ``eval.rollout
.rollout_predict`` so the exported program is the whole compiled
autoregressive unroll (one call per served request).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Sequence

import jax
from jax import export as jax_export


def export_apply(
    fn: Callable,
    example_args: Sequence,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> jax_export.Exported:
    """Trace + lower ``fn`` at ``example_args`` for every platform.

    ``fn`` must be a pure function of arrays (close over params, or wrap
    with ``functools.partial``); shapes/dtypes of the artifact are fixed
    to those of ``example_args``.
    """
    return jax_export.export(jax.jit(fn), platforms=list(platforms))(*example_args)


def save_exported(art: jax_export.Exported, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(art.serialize())
    return path


def load_exported(path: str | Path) -> Callable:
    """Deserialize an artifact into a jit-compatible callable."""
    art = jax_export.deserialize(Path(path).read_bytes())
    return art.call
