"""Training CLIs.

Replaces the reference Hydra dispatchers
(``pdebench/models/train_models_forward.py:12-57`` and
``train_models_aux_forward.py:12-62``):

  pde-train      --config config_dr --dataset basic_ds8 [key=value ...]
  pde-train-aux  --config config_dr --dataset basic_ds8 [key=value ...]

plus ``python -m sciml_pde_tpu.train.cli transformer ...`` for the
transformer family (the reference's per-directory mains).
"""

from __future__ import annotations

import argparse
import inspect

from sciml_pde_tpu.utils.config import load_config


def _call_with_supported(fn, args: dict, override_keys=(), **extra):
    sig = inspect.signature(fn)
    kwargs = {k: v for k, v in args.items() if k in sig.parameters}
    kwargs.update({k: v for k, v in extra.items() if k in sig.parameters})
    # Config-file keys the trainer doesn't take are dropped silently (the
    # presets carry FNO-only keys), but an explicit key=value override that
    # lands nowhere is a user error — fail loudly instead of ignoring it.
    unknown = [k for k in override_keys if k not in sig.parameters]
    if unknown:
        raise SystemExit(
            f"unknown override(s) for {fn.__name__}: {', '.join(unknown)}"
        )
    return fn(**kwargs)


def _parse(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="config_dr")
    p.add_argument("--dataset", default=None, help="preset, e.g. basic_ds8")
    p.add_argument("overrides", nargs="*", help="key=value overrides")
    return p.parse_args(argv)


def _override_keys(a):
    return [kv.split("=", 1)[0] for kv in a.overrides if "=" in kv]


def main(argv=None):
    from sciml_pde_tpu.train.fno_train import run_training

    a = _parse(argv)
    cfg = load_config(a.config, a.dataset, a.overrides)
    return _call_with_supported(run_training, cfg, _override_keys(a), if_aux=False)


def main_aux(argv=None):
    from sciml_pde_tpu.train.fno_train import run_training

    a = _parse(argv)
    cfg = load_config(a.config, a.dataset, a.overrides)
    return _call_with_supported(run_training, cfg, _override_keys(a), if_aux=True)


# FNO-config keys that name the same knob differently in the transformer
# trainer (the reference's per-directory mains each hard-code their own).
_TRANSFORMER_ALIASES = {"num_channels": "in_chans"}


def main_transformer(argv=None):
    from sciml_pde_tpu.train.transformer_train import run_transformer_training

    a = _parse(argv)
    cfg = dict(load_config(a.config, a.dataset, a.overrides))
    for src, dst in _TRANSFORMER_ALIASES.items():
        if src in cfg and dst not in cfg:
            cfg[dst] = cfg.pop(src)
    keys = [_TRANSFORMER_ALIASES.get(k, k) for k in _override_keys(a)]
    return _call_with_supported(run_transformer_training, cfg, keys)


if __name__ == "__main__":
    import sys

    cmd = sys.argv[1] if len(sys.argv) > 1 else "train"
    argv = sys.argv[2:]
    {"train": main, "aux": main_aux, "transformer": main_transformer}[cmd](argv)
