"""Irregular point-set BVP training driver (electro/magneto/airfoil class).

Capability parity with the vendored suite's BVP CLIs
(``OFormer Model Comparison/BVP/train_electro.py`` / ``train_magneto.py``
and the steady airfoil case): variable-size scattered node sets arrive
zero-padded with pad masks, the model is the pad-aware irregular
encoder/decoder (``models/oformer.OFormerIrreg2D``), the loss is the
pointwise masked relative loss (``train_electro.py:128-141``) over the
scalar (potential) head plus the field head.

The reference trains on proprietary .mat exports; this driver accepts
any ``(features, coords, pad_mask, bound_mask, scalar, field)`` arrays
and ships a physical synthetic generator: random 2D point charges with a
grounded boundary, potential ``phi = sum q_i log r_i`` and field
``E = -grad phi`` sampled on scattered nodes — the same steady
Poisson-BVP structure as the electrostatics dataset.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sciml_pde_tpu.models.oformer import OFormerIrreg2D
from sciml_pde_tpu.utils.logging import MetricLogger


def synthetic_electrostatics(
    seed: int,
    n_samples: int,
    max_points: int = 128,
    n_charges: int = 4,
    min_points: int | None = None,
):
    """Random point-charge BVPs on scattered nodes.

    Returns dict of arrays:
      features (N, P, 3*n_charges): per node, (dx, dy, q) to each charge
      coords   (N, P, 2), pad_mask (N, P) bool, bound_mask (N, P) bool
      scalar   (N, P, 1) potential;  field (N, P, 2) = -grad(potential)
    Node counts vary per sample (pad rows zeroed), boundary nodes sit on
    the unit-square edge with the potential clamped to 0 (grounded).
    """
    rng = np.random.default_rng(seed)
    min_points = min_points or max_points // 2
    feats = np.zeros((n_samples, max_points, 3 * n_charges), np.float32)
    coords = np.zeros((n_samples, max_points, 2), np.float32)
    pad = np.zeros((n_samples, max_points), bool)
    bound = np.zeros((n_samples, max_points), bool)
    phi = np.zeros((n_samples, max_points, 1), np.float32)
    efield = np.zeros((n_samples, max_points, 2), np.float32)

    for s in range(n_samples):
        n_pts = int(rng.integers(min_points, max_points + 1))
        n_bnd = max(n_pts // 8, 4)
        inner = rng.uniform(0.05, 0.95, size=(n_pts - n_bnd, 2))
        t = rng.uniform(0, 4, size=n_bnd)
        side, frac = np.floor(t).astype(int), t - np.floor(t)
        bx = np.where(side == 0, frac, np.where(side == 1, 1.0, np.where(side == 2, 1 - frac, 0.0)))
        by = np.where(side == 0, 0.0, np.where(side == 1, frac, np.where(side == 2, 1.0, 1 - frac)))
        pts = np.concatenate([inner, np.stack([bx, by], 1)])

        q = rng.uniform(-1, 1, size=n_charges)
        cpos = rng.uniform(0.2, 0.8, size=(n_charges, 2))
        d = pts[:, None, :] - cpos[None, :, :]  # (P, K, 2)
        r2 = np.maximum((d ** 2).sum(-1), 1e-3)
        # phi = -sum q log r  (2D free-space Green's function, sign conv.)
        p = -(q[None] * 0.5 * np.log(r2)).sum(-1)
        e = (q[None, :, None] * d / r2[..., None]).sum(1)  # E = -grad phi

        coords[s, :n_pts] = pts
        feats[s, :n_pts] = np.concatenate(
            [d.reshape(n_pts, -1), np.broadcast_to(q, (n_pts, n_charges))], 1
        )[:, : 3 * n_charges]
        pad[s, :n_pts] = True
        bound[s, n_pts - n_bnd : n_pts] = True
        phi[s, :n_pts, 0] = p
        efield[s, :n_pts] = e

    return dict(features=feats, coords=coords, pad_mask=pad,
                bound_mask=bound, scalar=phi, field=efield)


def masked_pointwise_loss(pred, target, mask, p: int = 1):
    """Reference pointwise_rel_loss (train_electro.py:128-141) with pad
    masking: mean |pred - target|^p over valid nodes."""
    diff = jnp.abs(pred - target) if p == 1 else (pred - target) ** p
    m = mask[..., None].astype(pred.dtype)
    return jnp.sum(diff * m) / jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)


@dataclasses.dataclass
class PointsetResult:
    params: object
    history: list


def run_pointset_training(
    data: dict,
    *,
    latent_channels: int = 64,
    heads: int = 1,
    depth: int = 2,
    batch_size: int = 8,
    epochs: int = 10,
    learning_rate: float = 8e-4,
    field_weight: float = 0.5,
    seed: int = 6,
    run_dir: str = "runs/pointset_bvp",
    log_every: int = 100,
) -> PointsetResult:
    logger = MetricLogger(run_dir, name="pointset_bvp")
    rng = np.random.default_rng(seed)
    n = data["features"].shape[0]

    model = OFormerIrreg2D(
        input_channels=data["features"].shape[-1],
        latent_channels=latent_channels, heads=heads, depth=depth,
    )
    arrs = {k: jnp.asarray(v) for k, v in data.items()}
    params = model.init(
        jax.random.PRNGKey(seed), arrs["features"][:1], arrs["coords"][:1],
        arrs["pad_mask"][:1], arrs["bound_mask"][:1],
    )["params"]

    steps = max(epochs * (n // batch_size), 1)
    tx = optax.adamw(optax.cosine_decay_schedule(learning_rate, steps))
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rows):
        f = arrs["features"][rows]
        c = arrs["coords"][rows]
        pm = arrs["pad_mask"][rows]
        bm = arrs["bound_mask"][rows]

        def loss_fn(pp):
            scalar, field = model.apply({"params": pp}, f, c, pm, bm)
            ls = masked_pointwise_loss(scalar, arrs["scalar"][rows], pm)
            lf = masked_pointwise_loss(field, arrs["field"][rows], pm)
            return ls + field_weight * lf, (ls, lf)

        (loss, (ls, lf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, ls, lf

    history, gstep = [], 0
    for ep in range(epochs):
        order = rng.permutation(n)
        for b in range(0, n - batch_size + 1, batch_size):
            params, opt_state, loss, ls, lf = step(
                params, opt_state, jnp.asarray(order[b : b + batch_size])
            )
            gstep += 1
            if gstep % log_every == 0:
                logger.log(gstep, loss=float(loss), scalar=float(ls),
                           field=float(lf), epoch=ep)
        history.append({"epoch": ep, "loss": float(loss),
                        "scalar_loss": float(ls), "field_loss": float(lf)})
    return PointsetResult(params=params, history=history)


def evaluate_pointset(model, params, data: dict):
    """Masked L1 of both heads on held-out samples."""
    scalar, field = model.apply(
        {"params": params}, jnp.asarray(data["features"]),
        jnp.asarray(data["coords"]), jnp.asarray(data["pad_mask"]),
        jnp.asarray(data["bound_mask"]),
    )
    return {
        "scalar_l1": float(masked_pointwise_loss(
            scalar, jnp.asarray(data["scalar"]), jnp.asarray(data["pad_mask"]))),
        "field_l1": float(masked_pointwise_loss(
            field, jnp.asarray(data["field"]), jnp.asarray(data["pad_mask"]))),
    }
