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


def restore_params(path: str | Path) -> tuple[Any, float]:
    """Template-free restore of just (params, best-val loss) — for
    eval-only paths where the optimizer state is irrelevant."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    return tree["params"], float(tree["meta"]["loss"])


def load_partial_params(params: dict, pretrained: dict, verbose: bool = True) -> dict:
    """Overlay pretrained weights where the path exists AND the shape
    matches; keep fresh init elsewhere — the reference's VideoMAE
    pretrained-weight partial loading with key filtering
    (Transformer_2D_NS/Ours/transformer.py:62-88)."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_q = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    out = {}
    loaded, skipped = 0, 0
    for path, leaf in flat_p.items():
        cand = flat_q.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            out[path] = cand
            loaded += 1
        else:
            out[path] = leaf
            skipped += 1
    if verbose:
        print(f"load_partial_params: {loaded} loaded, {skipped} kept fresh")
    treedef = jax.tree_util.tree_structure(params)
    ordered = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, ordered)
