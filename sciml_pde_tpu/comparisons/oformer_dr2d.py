"""OFormer / Hyena-hybrid training and evaluation on 2D diffusion-reaction.

Capability parity with the reference's repo-specific comparison drivers
(``OFormer Model Comparison/eval_oformer_rd2d.py:22-100+`` and
``Hyena Model Comparison/eval_hyena_rd2d.py``): grid fields are flattened
to point sets with unit-square coordinates, the model predicts the next
frame pointwise, and evaluation reports
  - relative L2 (pointwise, per step of an autoregressive rollout),
  - accumulated MSE,
  - final-step relative L2,
  - rollout and final-step nRMSE.

The generic Burgers/Darcy/NS training CLIs of the vendored OFormer live in
the same model code (``sciml_pde_tpu/models/oformer.py``); this driver is
the experiment the reference actually runs for the paper.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sciml_pde_tpu.data.dr import load_dr_baseline
from sciml_pde_tpu.data.windows import epoch_batches, gather_windows
from sciml_pde_tpu.models.hyena import HyenaOFormer2D
from sciml_pde_tpu.models.oformer import OFormer2D
from sciml_pde_tpu.utils.logging import MetricLogger


def rel_l2(pred, tgt, eps=1e-20):
    n = pred.shape[0]
    d = jnp.linalg.norm(pred.reshape(n, -1) - tgt.reshape(n, -1), axis=1)
    return jnp.mean(d / (eps + jnp.linalg.norm(tgt.reshape(n, -1), axis=1)))


def _flatten_window(x):
    """(B, X, Y, T, C) -> points (B, N, T*C)."""
    b, nx, ny, t, c = x.shape
    return x.reshape(b, nx * ny, t * c)


def _pos_for(grid, b):
    nx, ny, _ = grid.shape
    return jnp.broadcast_to(grid.reshape(1, nx * ny, 2), (b, nx * ny, 2))


@dataclasses.dataclass
class ComparisonResult:
    params: object
    history: list
    model: object = None
    test_w: object = None


def run_comparison_training(
    *,
    base_path: str,
    model_type: str = "oformer",  # oformer | hyena
    dataset_family: str = "dr",  # dr | ns (tune_navier_stokes.py equivalent)
    train_subsample: int = 4,
    initial_step: int = 10,
    num_channels: int = 2,
    batch_size: int = 4,
    epochs: int = 10,
    learning_rate: float = 3e-4,
    in_emb_dim: int = 96,
    latent_channels: int = 192,
    heads: int = 4,
    depth: int = 2,
    test_range=(250, 275),
    run_dir: str = "runs/comparison",
    model_name: str = "oformer_dr",
    log_every: int = 100,
    seed: int = 16,
) -> ComparisonResult:
    rng = np.random.default_rng(seed)
    logger = MetricLogger(run_dir, name=model_name)
    if dataset_family == "ns":
        from sciml_pde_tpu.data.ns import load_ns_baseline

        ds = load_ns_baseline(base_path, train_subsample=train_subsample,
                              initial_step=initial_step, rollout_test=1,
                              test_range=test_range)
    else:
        ds = load_dr_baseline(base_path, train_subsample=train_subsample,
                              initial_step=initial_step, rollout_test=1)
    train_w, test_w = ds.train, ds.test
    cin = initial_step * num_channels + 2  # window + coordinates

    if model_type == "hyena":
        model = HyenaOFormer2D(
            input_channels=cin, out_channels=num_channels,
            in_emb_dim=in_emb_dim, latent_channels=latent_channels,
            heads=heads, depth=depth, branches=8,
        )
    else:
        model = OFormer2D(
            input_channels=cin, out_channels=num_channels,
            in_emb_dim=in_emb_dim, latent_channels=latent_channels,
            heads=heads, depth=depth, out_steps=1, propagator_depth=1,
        )

    train_idx = train_w.window_index()
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(
            learning_rate, max(epochs * (len(train_idx) // batch_size), 1))),
    )

    def prep(x, grid):
        pts = _flatten_window(x)
        pos = _pos_for(grid, pts.shape[0])
        return jnp.concatenate([pts, pos], axis=-1), pos

    x0, _ = gather_windows(train_w.data, jnp.asarray(train_idx[:1]), initial_step, 1)
    inp0, pos0 = prep(x0, train_w.grid)
    params = model.init(jax.random.PRNGKey(seed), inp0, pos0)["params"]
    opt_state = tx.init(params)

    def loss_fn(p, inp, pos, y):
        pred = model.apply({"params": p}, inp, pos)
        return rel_l2(pred, y)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, data, grid, idx):
        x, y = gather_windows(data, idx, initial_step, 1)
        inp, pos = prep(x, grid)
        yf = y[..., 0, :].reshape(y.shape[0], -1, y.shape[-1])
        loss, grads = jax.value_and_grad(loss_fn)(params, inp, pos, yf)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    gstep = 0
    for ep in range(epochs):
        for batch in epoch_batches(train_idx, batch_size, rng):
            params, opt_state, loss = step(
                params, opt_state, train_w.data, train_w.grid, jnp.asarray(batch)
            )
            gstep += 1
            if gstep % log_every == 0:
                logger.log(gstep, train_rel_l2=float(loss), epoch=ep)
        history.append({"epoch": ep, "train_rel_l2": float(loss)})
    return ComparisonResult(params=params, history=history, model=model, test_w=test_w)


def evaluate_comparison(
    model, params, test_w, initial_step: int, rollout_steps: int, batch_size: int = 4
) -> dict:
    """Autoregressive rollout metrics (eval_oformer_rd2d.py reporting)."""
    idx = test_w.window_index()
    grid = test_w.grid
    nx, ny, _ = grid.shape
    c = test_w.data.shape[-1]

    @jax.jit
    def roll(p, chunk):
        x, y = gather_windows(test_w.data, chunk, initial_step, rollout_steps)
        b = x.shape[0]
        pos = _pos_for(grid, b)

        def body(xx, _):
            inp = jnp.concatenate([_flatten_window(xx), pos], axis=-1)
            pred_pts = model.apply({"params": p}, inp, pos)  # (b, n, c)
            pred = pred_pts.reshape(b, nx, ny, 1, c)
            xx = jnp.concatenate([xx[..., 1:, :], pred], axis=-2)
            return xx, pred_pts

        _, preds = jax.lax.scan(body, x, None, length=rollout_steps)
        tgt = jnp.moveaxis(y, -2, 0).reshape(rollout_steps, -1, nx * ny, c)
        return preds, tgt

    per_step_rel, mses = [], []
    for b in range(0, len(idx), batch_size):
        chunk = jnp.asarray(idx[b : b + batch_size])
        preds, tgt = roll(params, chunk)
        for t in range(rollout_steps):
            per_step_rel.append((t, float(rel_l2(preds[t], tgt[t]))))
        mses.append(float(jnp.mean((preds - tgt) ** 2)))

    steps = {}
    for t, v in per_step_rel:
        steps.setdefault(t, []).append(v)
    rel_by_step = [float(np.mean(steps[t])) for t in sorted(steps)]
    # nRMSE over the whole rollout and the final step
    return {
        "rel_l2_by_step": rel_by_step,
        "rollout_rel_l2": float(np.mean(rel_by_step)),
        "final_rel_l2": rel_by_step[-1],
        "accumulated_mse": float(np.mean(mses)),
    }
