"""Config system: YAML arg trees with dataset-size presets.

Reproduces the reference's Hydra/OmegaConf pattern
(``models/config/config_dr.yaml`` etc.): a base ``args`` mapping plus
``basic_dsN`` presets that override ``train_subsample`` — without the Hydra
dependency (not available in this environment).  Presets are selected by
name: ``load_config("config_dr", "basic_ds8")``.

Overrides use dotted ``key=value`` strings like Hydra CLI overrides.
"""

from __future__ import annotations

import ast
from pathlib import Path
from typing import Any

import yaml

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def _parse_value(v: str) -> Any:
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def load_config(
    name_or_path: str,
    dataset: str | None = None,
    overrides: list[str] | None = None,
) -> dict[str, Any]:
    """Load a config; ``dataset`` picks a preset block merged over ``args``."""
    path = Path(name_or_path)
    if not path.exists():
        path = CONFIG_DIR / f"{name_or_path}.yaml"
    with path.open() as f:
        tree = yaml.safe_load(f)

    args = dict(tree.get("args", {}))
    if dataset is not None:
        if dataset not in tree:
            raise KeyError(f"unknown dataset preset {dataset!r} in {path}")
        args.update(tree[dataset] or {})
    for ov in overrides or []:
        k, _, v = ov.partition("=")
        k = k.removeprefix("args.")
        args[k] = _parse_value(v)
    return args
