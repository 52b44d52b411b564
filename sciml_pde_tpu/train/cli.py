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


def _call_with_supported(fn, args: dict, **extra):
    sig = inspect.signature(fn)
    kwargs = {k: v for k, v in args.items() if k in sig.parameters}
    kwargs.update({k: v for k, v in extra.items() if k in sig.parameters})
    return fn(**kwargs)


def _parse(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="config_dr")
    p.add_argument("--dataset", default=None, help="preset, e.g. basic_ds8")
    p.add_argument("overrides", nargs="*", help="key=value overrides")
    return p.parse_args(argv)


def main(argv=None):
    from sciml_pde_tpu.train.fno_train import run_training

    a = _parse(argv)
    cfg = load_config(a.config, a.dataset, a.overrides)
    return _call_with_supported(run_training, cfg, if_aux=False)


def main_aux(argv=None):
    from sciml_pde_tpu.train.fno_train import run_training

    a = _parse(argv)
    cfg = load_config(a.config, a.dataset, a.overrides)
    return _call_with_supported(run_training, cfg, if_aux=True)


def main_transformer(argv=None):
    from sciml_pde_tpu.train.transformer_train import run_transformer_training

    a = _parse(argv)
    cfg = load_config(a.config, a.dataset, a.overrides)
    return _call_with_supported(run_transformer_training, cfg)


if __name__ == "__main__":
    import sys

    cmd = sys.argv[1] if len(sys.argv) > 1 else "train"
    argv = sys.argv[2:]
    {"train": main, "aux": main_aux, "transformer": main_transformer}[cmd](argv)
