"""Optimizer assembly matching the reference training dynamics.

- torch ``Adam(weight_decay=1e-4)`` == L2-to-gradient before the moment
  update (NOT AdamW): ``optax.add_decayed_weights`` placed before
  ``scale_by_adam`` (reference fno/train.py:168-170).
- Adaptive gradient clipping: clip-norm = max(5, 0.1 * ||g||)
  (reference fno/train.py:253-255) as a custom GradientTransformation.
- Cosine annealing over total optimizer steps or StepLR
  (reference fno/train.py:174-177).
- Per-group learning rates for aux training (shared backbone vs the two
  heads, reference fno_train_aux.py:175-179) via parameter-path masks.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def adaptive_clip(floor: float = 5.0, frac: float = 0.1) -> optax.GradientTransformation:
    """clip_grad_norm_ with threshold max(floor, frac * total_norm)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        clip_value = jnp.maximum(floor, frac * g_norm)
        scale = jnp.minimum(1.0, clip_value / (g_norm + 1e-12))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(
    kind: str,
    learning_rate: float,
    total_steps: int,
    scheduler_step: int = 100,
    scheduler_gamma: float = 0.5,
) -> optax.Schedule:
    if kind == "cosine":
        return optax.cosine_decay_schedule(learning_rate, decay_steps=max(total_steps, 1))
    if kind == "step":
        # Cadence note: the reference calls ``scheduler.step()`` once per
        # optimizer step inside BOTH training branches (fno/train.py:258,
        # :278) and once more at the end of each epoch (:340), so its
        # StepLR counter advances steps_per_epoch+1 times per epoch.  The
        # per-optimizer-step term dominates (steps_per_epoch >> 1) and is
        # what this schedule reproduces; the extra per-epoch tick shifts
        # the decay boundary by <1% for any realistic epoch size.
        return optax.exponential_decay(
            learning_rate,
            transition_steps=scheduler_step,
            decay_rate=scheduler_gamma,
            staircase=True,
        )
    raise ValueError(f"unknown scheduler {kind!r}")


def _torch_adam(schedule: optax.Schedule, weight_decay: float) -> optax.GradientTransformation:
    return optax.chain(
        adaptive_clip(),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def make_optimizer(
    learning_rate: float,
    total_steps: int,
    scheduler: str = "cosine",
    weight_decay: float = 1e-4,
    scheduler_step: int = 100,
    scheduler_gamma: float = 0.5,
) -> optax.GradientTransformation:
    """Single-group optimizer (baseline FNO/transformer trainers)."""
    sched = make_lr_schedule(scheduler, learning_rate, total_steps, scheduler_step, scheduler_gamma)
    return _torch_adam(sched, weight_decay)


def make_grouped_optimizer(
    group_of: Callable[[tuple], str],
    learning_rates: dict[str, float],
    total_steps: int,
    scheduler: str = "cosine",
    weight_decay: float = 1e-4,
    scheduler_step: int = 100,
    scheduler_gamma: float = 0.5,
) -> optax.GradientTransformation:
    """Per-group LRs (reference fno_train_aux.py:175-179).

    NOTE: the adaptive clip must see the *global* gradient norm (the
    reference clips over all parameters at once), so it sits outside the
    per-group partition.

    Args:
      group_of: maps a parameter path (tuple of keys) to a group name.
      learning_rates: group name -> peak learning rate.
    """
    transforms = {
        name: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(
                make_lr_schedule(scheduler, lr, total_steps, scheduler_step, scheduler_gamma)
            ),
        )
        for name, lr in learning_rates.items()
    }

    def label_fn(params):
        flat = jax.tree_util.tree_map_with_path(
            lambda path, _: group_of(tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path)),
            params,
        )
        return flat

    return optax.chain(adaptive_clip(), optax.multi_transform(transforms, label_fn))


def aux_group_of(path: tuple) -> str:
    """Map FNOAux param paths to {shared, primary_head, aux_head}."""
    top = str(path[0]) if path else ""
    if top.startswith("fc2_primary"):
        return "primary_head"
    if top.startswith("fc2_auxiliary"):
        return "aux_head"
    return "shared"
