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


def standardize_features(train: dict, *others: dict):
    """Per-column feature standardization from TRAIN-set statistics.

    The reference BVP loader standard-scales its FEM export before
    training (``dataset_new.py`` keeps per-column statistics; its
    proprietary export arrives pre-scaled).  Our regenerated data keeps
    raw physics on disk (``sim/bvp_2d.py``: the source-density column
    reaches O(1e3)), so scaling is a loader concern: compute mean/std per
    feature column over VALID (non-pad) train nodes, apply to train and
    any held-out splits, and re-zero pad rows so padding stays inert.

    Returns ``(train', *others', stats)`` with ``stats = (mean, std)``.
    """
    m = train["pad_mask"][..., None].astype(np.float64)
    f = train["features"].astype(np.float64)
    denom = np.maximum(m.sum(axis=(0, 1)), 1.0)
    mean = (f * m).sum(axis=(0, 1)) / denom
    var = (((f - mean) ** 2) * m).sum(axis=(0, 1)) / denom
    std = np.maximum(np.sqrt(var), 1e-6)

    def apply(d):
        out = dict(d)
        g = (d["features"] - mean.astype(np.float32)) / std.astype(np.float32)
        out["features"] = (g * d["pad_mask"][..., None]).astype(np.float32)
        return out

    scaled = [apply(train)] + [apply(o) for o in others]
    return (*scaled, (mean.astype(np.float32), std.astype(np.float32)))


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
    loss_p: int = 1,
    clip: float | None = None,
    reference_recipe: bool = False,
    seed: int = 6,
    run_dir: str = "runs/pointset_bvp",
    log_every: int = 100,
    total_steps: int | None = None,
) -> PointsetResult:
    """Train the irregular-point-set operator.

    ``reference_recipe=True`` follows the BVP suite exactly
    (train_electro.py:283-293,366): AdamW(amsgrad, wd 1e-4), OneCycle
    (div 1e2, pct_start 0.1, final_div 1e4), grad clip 2.0, squared
    pointwise loss with field weight 1.0.

    ``total_steps``: optimizer-step budget, overriding ``epochs`` — the
    reference trains iteration-budgeted (train_electro.py: 100k iters by
    default), not epoch-budgeted; epochs then just bounds the loop.
    """
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

    steps_per_epoch = max(n // batch_size, 1)
    steps = total_steps if total_steps else max(epochs * steps_per_epoch, 1)
    epochs = -(-steps // steps_per_epoch)  # enough epochs to cover the budget
    if reference_recipe:
        loss_p, field_weight = 2, 1.0
        # torch OneCycleLR(div 1e2, pct_start 0.1, final_div 1e4) with the
        # default cos anneal == warmup+cosine.  (optax's
        # linear_onecycle_schedule divides by a zero-length interval and
        # returns NaN when 10% of the step budget rounds to < 1 step.)
        sched = optax.warmup_cosine_decay_schedule(
            init_value=learning_rate / 1e2, peak_value=learning_rate,
            warmup_steps=max(int(0.1 * steps), 1), decay_steps=steps,
            end_value=learning_rate / 1e4)
        tx = optax.chain(
            optax.clip_by_global_norm(clip if clip is not None else 2.0),
            optax.add_decayed_weights(1e-4),
            optax.scale_by_amsgrad(),
            optax.scale_by_learning_rate(sched),
        )
    else:
        tx = optax.adamw(optax.cosine_decay_schedule(learning_rate, steps))
        if clip is not None:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rows):
        f = arrs["features"][rows]
        c = arrs["coords"][rows]
        pm = arrs["pad_mask"][rows]
        bm = arrs["bound_mask"][rows]

        def loss_fn(pp):
            scalar, field = model.apply({"params": pp}, f, c, pm, bm)
            ls = masked_pointwise_loss(scalar, arrs["scalar"][rows], pm, p=loss_p)
            lf = masked_pointwise_loss(field, arrs["field"][rows], pm, p=loss_p)
            return ls + field_weight * lf, (ls, lf)

        (loss, (ls, lf)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, ls, lf

    history, gstep = [], 0
    for ep in range(epochs):
        order = rng.permutation(n)
        for b in range(0, n - batch_size + 1, batch_size):
            if gstep >= steps:
                break
            params, opt_state, loss, ls, lf = step(
                params, opt_state, jnp.asarray(order[b : b + batch_size])
            )
            gstep += 1
            if gstep % log_every == 0:
                logger.log(gstep, loss=float(loss), scalar=float(ls),
                           field=float(lf), epoch=ep)
        history.append({"epoch": ep, "loss": float(loss),
                        "scalar_loss": float(ls), "field_loss": float(lf)})
        if gstep >= steps:
            break
    return PointsetResult(params=params, history=history)


def evaluate_pointset(model, params, data: dict):
    """Masked metrics on held-out samples.

    Reports both the masked L1 of each head and the reference BVP suite's
    test numbers (train_electro.py:440-456): MSE over valid nodes of the
    potential, of the field (mean of x/y components), and their sum, plus
    masked relative L2 for scale-free comparison.
    """
    scalar, field = model.apply(
        {"params": params}, jnp.asarray(data["features"]),
        jnp.asarray(data["coords"]), jnp.asarray(data["pad_mask"]),
        jnp.asarray(data["bound_mask"]),
    )
    tgt_s, tgt_f = jnp.asarray(data["scalar"]), jnp.asarray(data["field"])
    pm = jnp.asarray(data["pad_mask"])
    mse_pot = masked_pointwise_loss(scalar, tgt_s, pm, p=2)
    mse_field = masked_pointwise_loss(field, tgt_f, pm, p=2)
    m = pm[..., None].astype(scalar.dtype)

    def rel_l2(pred, tgt):
        num = jnp.sqrt(jnp.sum((pred - tgt) ** 2 * m))
        den = jnp.sqrt(jnp.sum(tgt**2 * m)) + 1e-12
        return num / den

    return {
        "scalar_l1": float(masked_pointwise_loss(scalar, tgt_s, pm)),
        "field_l1": float(masked_pointwise_loss(field, tgt_f, pm)),
        "mse_potential": float(mse_pot),
        "mse_field": float(mse_field),
        "mse_total": float(mse_pot + 2 * mse_field),
        "rel_l2_potential": float(rel_l2(scalar, tgt_s)),
        "rel_l2_field": float(rel_l2(field, tgt_f)),
    }


# --------------------------------------------------------------------------
# time-dependent point sets (airfoil class)
# --------------------------------------------------------------------------


def synthetic_vortex_sheet(
    seed: int,
    n_samples: int,
    n_points: int = 96,
    n_frames: int = 12,
    n_vortices: int = 3,
):
    """Time-dependent scattered-mesh flow: advecting Gaussian vortices
    sampled at fixed irregular nodes (the airfoil dataset's structure:
    fixed mesh, evolving (vx, vy, prs, dns) node states, integer node
    types distinguishing interior/boundary/obstacle)."""
    rng = np.random.default_rng(seed)
    fields = np.zeros((n_samples, n_frames, n_points, 4), np.float32)
    coords = np.zeros((n_samples, n_points, 2), np.float32)
    ntype = np.zeros((n_samples, n_points), np.int32)

    for s in range(n_samples):
        pts = rng.uniform(0, 1, size=(n_points, 2))
        on_edge = (pts.min(1) < 0.06) | (pts.max(1) > 0.94)
        centre = np.linalg.norm(pts - 0.5, axis=1) < 0.12
        ntype[s] = np.where(centre, 2, np.where(on_edge, 1, 0))
        coords[s] = pts

        amp = rng.uniform(0.5, 1.5, n_vortices)
        vx0 = rng.uniform(0.2, 0.8, (n_vortices, 2))
        drift = rng.uniform(-0.03, 0.03, (n_vortices, 2))
        for f in range(n_frames):
            cpos = vx0 + f * drift
            d = pts[:, None, :] - cpos[None, :, :]
            r2 = (d ** 2).sum(-1)
            g = np.exp(-r2 / 0.02)
            u = (-amp[None] * d[..., 1] * g).sum(1)
            v = (amp[None] * d[..., 0] * g).sum(1)
            prs = (amp[None] * g).sum(1)
            dns = 1.0 + 0.1 * prs
            fields[s, f] = np.stack([u, v, prs, dns], -1)
        fields[s, :, ntype[s] == 2] = 0.0  # no flow inside the obstacle

    return dict(fields=fields, coords=coords, node_type=ntype)


def run_airfoil_training(
    data: dict,
    *,
    time_window: int = 4,
    forward_steps: int = 2,
    emb_dim: int = 48,
    latent_channels: int = 48,
    depth: int = 2,
    batch_size: int = 4,
    epochs: int = 10,
    learning_rate: float = 8e-4,
    seed: int = 6,
    run_dir: str = "runs/pointset_airfoil",
    log_every: int = 100,
):
    """Train the ST point-set operator: a window of ``time_window`` frames
    predicts the next ``forward_steps`` frames on the same scattered mesh
    (reference train_airfoil.py training loop; positions enter both as
    features and as rotary coordinates)."""
    from sciml_pde_tpu.models.oformer import OFormerIrregST2D

    logger = MetricLogger(run_dir, name="pointset_airfoil")
    rng = np.random.default_rng(seed)
    fields = jnp.asarray(data["fields"])
    coords = jnp.asarray(data["coords"])
    ntype = jnp.asarray(data["node_type"])
    n, t, npts, c = fields.shape

    model = OFormerIrregST2D(
        input_channels=c + 2, out_channels=c, time_window=time_window,
        emb_dim=emb_dim, latent_channels=latent_channels, depth=depth,
    )

    # window index (sample, t0)
    idx = np.stack(
        [np.repeat(np.arange(n), t - time_window - forward_steps + 1),
         np.tile(np.arange(t - time_window - forward_steps + 1), n)], 1
    ).astype(np.int32)
    batch_size = max(1, min(batch_size, len(idx)))

    def gather(rows):
        def one(s, t0):
            win = jax.lax.dynamic_slice_in_dim(fields[s], t0, time_window + forward_steps, 0)
            return win[:time_window], win[time_window:]

        return jax.vmap(one)(rows[:, 0], rows[:, 1])

    def with_pos(x, rows):
        p = coords[rows[:, 0]]
        pb = jnp.broadcast_to(p[:, None], x.shape[:3] + (2,))
        return jnp.concatenate([x, pb], -1), p

    rows0 = jnp.asarray(idx[:1])
    x0, _ = gather(rows0)
    inp0, p0 = with_pos(x0, rows0)
    params = model.init(
        jax.random.PRNGKey(seed), inp0, ntype[rows0[:, 0]], p0, forward_steps
    )["params"]

    steps = max(epochs * (len(idx) // batch_size), 1)
    tx = optax.adamw(optax.cosine_decay_schedule(learning_rate, steps))
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rows):
        x, y = gather(rows)
        inp, p = with_pos(x, rows)
        nt = ntype[rows[:, 0]]

        def loss_fn(pp):
            pred = model.apply({"params": pp}, inp, nt, p, forward_steps)
            return jnp.mean(jnp.abs(pred - y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history, gstep = [], 0
    for ep in range(epochs):
        order = rng.permutation(len(idx))
        for b in range(0, len(idx) - batch_size + 1, batch_size):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(idx[order[b : b + batch_size]])
            )
            gstep += 1
            if gstep % log_every == 0:
                logger.log(gstep, l1=float(loss), epoch=ep)
        history.append({"epoch": ep, "l1": float(loss)})
    return PointsetResult(params=params, history=history)


def evaluate_airfoil(
    params, data: dict, *, time_window: int = 4, forward_steps: int = 2,
    emb_dim: int = 48, latent_channels: int = 48, depth: int = 2,
    batch_size: int = 8,
):
    """Held-out L1 and rel-L2 of the ST point-set operator over all windows."""
    from sciml_pde_tpu.models.oformer import OFormerIrregST2D

    fields = jnp.asarray(data["fields"])
    coords = jnp.asarray(data["coords"])
    ntype = jnp.asarray(data["node_type"])
    n, t, npts, c = fields.shape
    model = OFormerIrregST2D(
        input_channels=c + 2, out_channels=c, time_window=time_window,
        emb_dim=emb_dim, latent_channels=latent_channels, depth=depth,
    )
    idx = np.stack(
        [np.repeat(np.arange(n), t - time_window - forward_steps + 1),
         np.tile(np.arange(t - time_window - forward_steps + 1), n)], 1
    ).astype(np.int32)
    batch_size = max(1, min(batch_size, len(idx)))

    @jax.jit
    def batch_metrics(rows):
        def one(s, t0):
            win = jax.lax.dynamic_slice_in_dim(
                fields[s], t0, time_window + forward_steps, 0
            )
            return win[:time_window], win[time_window:]

        x, y = jax.vmap(one)(rows[:, 0], rows[:, 1])
        p = coords[rows[:, 0]]
        pb = jnp.broadcast_to(p[:, None], x.shape[:3] + (2,))
        inp = jnp.concatenate([x, pb], -1)
        pred = model.apply({"params": params}, inp, ntype[rows[:, 0]], p, forward_steps)
        l1 = jnp.mean(jnp.abs(pred - y))
        rel = jnp.linalg.norm(pred - y) / (jnp.linalg.norm(y) + 1e-12)
        return l1, rel

    l1s, rels, nb = 0.0, 0.0, 0
    for b in range(0, len(idx) - batch_size + 1, batch_size):
        l1, rel = batch_metrics(jnp.asarray(idx[b : b + batch_size]))
        l1s += float(l1)
        rels += float(rel)
        nb += 1
    return {"l1": l1s / max(nb, 1), "rel_l2": rels / max(nb, 1)}
