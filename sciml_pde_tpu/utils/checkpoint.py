"""Checkpointing with orbax: best-validation semantics of the reference.

The reference saves {epoch, model_state_dict, optimizer_state_dict, loss}
only when validation improves (fno/train.py:319-329) and restores all four
for ``continue_training`` (fno/train.py:189-204).  Here the same quadruple
is an orbax-saved pytree.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str | Path, params: Any, opt_state: Any, epoch: int, loss: float):
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        tree = {
            "params": jax.tree_util.tree_map(np.asarray, params),
            "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
            "meta": {"epoch": np.asarray(epoch), "loss": np.asarray(loss)},
        }
        if path.exists():
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, tree)


def restore_checkpoint(path: str | Path, like: dict[str, Any]) -> dict[str, Any]:
    """Restore against a template pytree {params, opt_state, meta}."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        template = jax.tree_util.tree_map(np.asarray, like)
        return ckptr.restore(path, template)
