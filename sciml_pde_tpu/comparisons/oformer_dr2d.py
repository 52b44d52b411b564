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

    # token count of the flattened grid (sizes the Hyena filter support)
    n_tokens = int(np.prod(train_w.data.shape[2:4]))
    if model_type == "hyena":
        model = HyenaOFormer2D(
            input_channels=cin, out_channels=num_channels,
            in_emb_dim=in_emb_dim, latent_channels=latent_channels,
            heads=heads, depth=depth, branches=8, l_max=n_tokens,
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


# --------------------------------------------------------------------------
# Reference-protocol rollout training (eval_oformer_rd2d.py semantics)
# --------------------------------------------------------------------------
#
# The reference's DR comparison trains a 64x64, single-channel OFormer that
# encodes the first ``in_seq_len`` frames ONCE and decodes a long rollout
# through the latent propagator (``dec.rollout(z, pos, out_seq_len, pos)``,
# eval_oformer_rd2d.py:110-113), with inputs/targets standardized by the
# train statistics (eval_oformer_rd2d.py:95-98,113).  The 1-step
# ``run_comparison_training`` above is the light smoke path; this is the
# faithful study.


def _protocol_arrays(base_path, *, train_subsample, extra_train_files,
                     in_seq_len, out_seq_len, spatial_down, channel):
    """Load the DR pool and shape it into reference-protocol tensors.

    Returns dict of float32 arrays:
      x: (N, n_tokens, in_seq_len*C) normalized inputs
      y: (N, out_seq_len, n_tokens, C) normalized targets
      pos: (n_tokens, 2) unit-square coordinates, plus the norm stats.
    """
    from pathlib import Path

    from sciml_pde_tpu.data.dr import PRIMARY_FILE, _load_train_pool

    train, test, grid = _load_train_pool(
        Path(base_path), PRIMARY_FILE, train_subsample, extra_train_files)
    d = spatial_down
    out = {}
    for name, arr in (("train", train), ("test", test)):
        a = np.asarray(arr)[:, : in_seq_len + out_seq_len, ::d, ::d, :]
        if channel is not None:
            a = a[..., channel : channel + 1]
        n, _, h, w, c = a.shape
        x = a[:, :in_seq_len]            # (N, t, H, W, C)
        y = a[:, in_seq_len:]
        x = np.moveaxis(x, 1, 3).reshape(n, h * w, in_seq_len * c)
        y = y.reshape(n, out_seq_len, h * w, c)
        out[name] = (x.astype(np.float32), y.astype(np.float32))
    (x_tr, y_tr), (x_te, y_te) = out["train"], out["test"]
    stats = {
        "x_mean": float(x_tr.mean()), "x_std": float(x_tr.std() + 1e-8),
        "y_mean": float(y_tr.mean()), "y_std": float(y_tr.std() + 1e-8),
    }
    g = np.asarray(grid)[::d, ::d].reshape(-1, 2).astype(np.float32)
    return {
        "x_train": (x_tr - stats["x_mean"]) / stats["x_std"],
        "y_train": (y_tr - stats["y_mean"]) / stats["y_std"],
        "x_test": (x_te - stats["x_mean"]) / stats["x_std"],
        "y_test_raw": y_te,
        "pos": g, **stats,
    }


def run_rollout_protocol(
    *,
    base_path: str,
    model_type: str = "oformer",  # oformer | hyena
    in_seq_len: int = 10,
    out_seq_len: int = 40,
    spatial_down: int = 2,        # 128 -> 64 grid, the reference resolution
    channel: int | None = 0,      # reference trains the activator channel
    train_subsample=270,
    extra_train_files: list[str] | None = None,
    batch_size: int = 4,
    epochs: int = 100,
    learning_rate: float = 3e-4,
    in_emb_dim: int = 96,
    latent_channels: int = 192,
    heads: int = 4,
    depth: int = 2,
    propagator_depth: int = 1,
    run_dir: str = "runs/comparison",
    model_name: str = "oformer_dr_rollout",
    log_every: int = 20,
    seed: int = 16,
):
    """Train + evaluate one model under the reference rollout protocol.

    Returns (metrics dict, params); metrics carry the five numbers the
    reference prints (eval_oformer_rd2d.py:121-127).
    """
    logger = MetricLogger(run_dir, name=model_name)
    rng = np.random.default_rng(seed)
    arrs = _protocol_arrays(
        base_path, train_subsample=train_subsample,
        extra_train_files=extra_train_files, in_seq_len=in_seq_len,
        out_seq_len=out_seq_len, spatial_down=spatial_down, channel=channel)
    x_tr = jnp.asarray(arrs["x_train"])
    y_tr = jnp.asarray(arrs["y_train"])
    n_tokens, cin_pts = x_tr.shape[1], x_tr.shape[2]
    c_out = y_tr.shape[-1]
    pos1 = jnp.asarray(arrs["pos"])  # (n_tokens, 2)

    kw = dict(input_channels=cin_pts + 2, out_channels=c_out,
              in_emb_dim=in_emb_dim, latent_channels=latent_channels,
              heads=heads, depth=depth, out_steps=1, remat=True)
    if model_type == "hyena":
        model = HyenaOFormer2D(**{k: v for k, v in kw.items()
                                  if k != "propagator_depth"},
                               branches=8, l_max=n_tokens)
    else:
        model = OFormer2D(**kw, propagator_depth=propagator_depth)

    def with_pos(xb):
        b = xb.shape[0]
        p = jnp.broadcast_to(pos1[None], (b, n_tokens, 2))
        return jnp.concatenate([xb, p], axis=-1), p

    n_train = int(x_tr.shape[0])
    steps_per_epoch = max(n_train // batch_size, 1)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(
            learning_rate, max(epochs * steps_per_epoch, 1))),
    )

    inp0, p0 = with_pos(x_tr[:1])
    params = model.init(jax.random.PRNGKey(seed), inp0, p0)["params"]
    opt_state = tx.init(params)

    def loss_fn(p, xb, yb):
        inp, pp = with_pos(xb)
        pred = model.apply({"params": p}, inp, pp, out_seq_len,
                           method=type(model).rollout)
        b = pred.shape[0]
        pred = pred.reshape(b, n_tokens, out_seq_len, c_out)
        pred = jnp.moveaxis(pred, 2, 1)  # (b, t, n, c)
        return rel_l2(pred, yb)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    gstep = 0
    history = []
    for ep in range(epochs):
        order = rng.permutation(n_train)
        for s in range(steps_per_epoch):
            rows = jnp.asarray(order[s * batch_size : (s + 1) * batch_size])
            params, opt_state, loss = step(params, opt_state,
                                           x_tr[rows], y_tr[rows])
            gstep += 1
            if gstep % log_every == 0:
                logger.log(gstep, train_rel_l2=float(loss), epoch=ep)
        history.append(float(loss))

    metrics = evaluate_rollout_protocol(
        model, params, arrs, out_seq_len=out_seq_len, batch_size=batch_size)
    metrics["train_rel_l2_final"] = history[-1]
    return metrics, params


def evaluate_rollout_protocol(model, params, arrs, *, out_seq_len,
                              batch_size=4):
    """The reference's five evaluation numbers (eval_oformer_rd2d.py:104-127):
    predictions are de-normalized with the train y-statistics and compared
    to raw targets."""
    x_te = jnp.asarray(arrs["x_test"])
    y_te = arrs["y_test_raw"]  # (N, t, n, c) raw units
    pos1 = jnp.asarray(arrs["pos"])
    n_tokens = x_te.shape[1]
    c_out = y_te.shape[-1]
    y_mean, y_std = arrs["y_mean"], arrs["y_std"]

    @jax.jit
    def roll(p, xb):
        b = xb.shape[0]
        pp = jnp.broadcast_to(pos1[None], (b, n_tokens, 2))
        inp = jnp.concatenate([xb, pp], axis=-1)
        pred = model.apply({"params": p}, inp, pp, out_seq_len,
                           method=type(model).rollout)
        pred = pred.reshape(b, n_tokens, out_seq_len, c_out)
        return jnp.moveaxis(pred, 2, 1) * y_std + y_mean

    def nrmse(pred, tgt):
        # per (sample, frame): rmse over tokens / target range over tokens
        ax = tuple(range(2, pred.ndim))
        rmse = np.sqrt(((pred - tgt) ** 2).mean(axis=ax) + 1e-12)
        rng_ = np.maximum(tgt.max(axis=ax) - tgt.min(axis=ax), 1e-12)
        return float((rmse / rng_).mean())

    rel_all, mse_all, rel_last, nr_all, nr_last = [], [], [], [], []
    for b0 in range(0, x_te.shape[0], batch_size):
        pred = np.asarray(roll(params, x_te[b0 : b0 + batch_size]))
        tgt = y_te[b0 : b0 + batch_size]
        rel_all.append(float(rel_l2(jnp.asarray(pred), jnp.asarray(tgt))))
        mse_all.append(float(((pred - tgt) ** 2).sum()
                             / (pred.shape[0] * pred.shape[2] * pred.shape[3])))
        rel_last.append(float(rel_l2(jnp.asarray(pred[:, -1:]),
                                     jnp.asarray(tgt[:, -1:]))))
        nr_all.append(nrmse(pred, tgt))
        nr_last.append(nrmse(pred[:, -1:], tgt[:, -1:]))
    return {
        "avg_rel_l2": float(np.mean(rel_all)),
        "accumulated_mse": float(np.mean(mse_all)),
        "final_rel_l2": float(np.mean(rel_last)),
        "nrmse_rollout": float(np.mean(nr_all)),
        "nrmse_final": float(np.mean(nr_last)),
    }
