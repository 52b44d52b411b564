"""Generic OFormer training on PDEBench-format datasets (Burgers / Darcy).

Capability parity with the vendored suite's generic CLIs
(``OFormer Model Comparison/train_burgers.py``, ``train_darcy.py``,
``dataset.py``/``dataset_new.py``): PDEBench 1D/2D HDF5 arrays (keyed
``tensor``/``u`` with coordinate arrays) are windowed into (input frames,
next frames) pairs over flattened point sets with coordinates; training
minimises relative L2.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sciml_pde_tpu.comparisons.oformer_dr2d import rel_l2
from sciml_pde_tpu.models.oformer import OFormer1D
from sciml_pde_tpu.utils.logging import MetricLogger


def load_pdebench_1d(path: str | Path, field_keys=("tensor", "u", "data")) -> np.ndarray:
    """PDEBench 1D file -> (N, T, X) float32."""
    with h5py.File(path, "r") as f:
        for k in field_keys:
            if k in f:
                return np.asarray(f[k], dtype=np.float32)
        raise KeyError(f"none of {field_keys} in {path}: has {list(f)}")


@dataclasses.dataclass
class Generic1DResult:
    params: object
    history: list
    norm_stats: tuple | None = None


def _make_burgers_model(initial_step=10, in_emb_dim=64, depth=3, heads=4):
    return OFormer1D(
        input_channels=initial_step + 1, out_channels=1,
        in_emb_dim=in_emb_dim, latent_channels=in_emb_dim,
        heads=heads, depth=depth, out_steps=1,
    )


def _make_darcy_model(in_emb_dim=64, depth=3, heads=4):
    from sciml_pde_tpu.models.oformer import OFormer2D

    return OFormer2D(
        input_channels=3, out_channels=1, in_emb_dim=in_emb_dim,
        latent_channels=in_emb_dim, heads=heads, depth=depth,
        out_steps=1, propagator_depth=1,
    )


def run_oformer_burgers(
    data: np.ndarray,  # (N, T, X)
    initial_step: int = 10,
    batch_size: int = 8,
    epochs: int = 5,
    learning_rate: float = 3e-4,
    in_emb_dim: int = 64,
    depth: int = 3,
    heads: int = 4,
    run_dir: str = "runs/oformer_burgers",
    seed: int = 16,
    log_every: int = 200,
) -> Generic1DResult:
    """Next-step operator training on 1D trajectories."""
    rng = np.random.default_rng(seed)
    logger = MetricLogger(run_dir, name="oformer_burgers")
    n, t, nx = data.shape
    pos = np.linspace(0, 1, nx, dtype=np.float32)[None, :, None]

    model = _make_burgers_model(initial_step, in_emb_dim, depth, heads)

    # window index over (traj, t0)
    idx = np.stack(
        [np.repeat(np.arange(n), t - initial_step),
         np.tile(np.arange(t - initial_step), n)], axis=1
    ).astype(np.int32)

    darr = jnp.asarray(data)
    parr = jnp.asarray(pos)

    def gather(b_idx):
        def one(i, t0):
            win = jax.lax.dynamic_slice_in_dim(darr[i], t0, initial_step + 1, axis=0)
            return win[:initial_step].T, win[initial_step][:, None]  # (X, t), (X, 1)

        return jax.vmap(one)(b_idx[:, 0], b_idx[:, 1])

    def prep(x):
        b = x.shape[0]
        p = jnp.broadcast_to(parr, (b, nx, 1))
        return jnp.concatenate([x, p], axis=-1), p

    x0, _ = gather(jnp.asarray(idx[:1]))
    inp0, p0 = prep(x0)
    params = model.init(jax.random.PRNGKey(seed), inp0, p0)["params"]
    steps = max(epochs * (len(idx) // batch_size), 1)
    tx = optax.adamw(optax.cosine_decay_schedule(learning_rate, steps))
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, b_idx):
        x, y = gather(b_idx)
        inp, p = prep(x)

        def loss_fn(pp):
            return rel_l2(model.apply({"params": pp}, inp, p), y)

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
                logger.log(gstep, rel_l2=float(loss), epoch=ep)
        history.append({"epoch": ep, "rel_l2": float(loss)})
    return Generic1DResult(params=params, history=history)


def run_oformer_darcy(
    a_field: np.ndarray,  # (N, X, Y) coefficient
    u_field: np.ndarray,  # (N, X, Y) solution
    batch_size: int = 4,
    epochs: int = 5,
    learning_rate: float = 3e-4,
    in_emb_dim: int = 64,
    depth: int = 3,
    heads: int = 4,
    run_dir: str = "runs/oformer_darcy",
    seed: int = 16,
) -> Generic1DResult:
    """Steady-state operator a(x) -> u(x) on a 2D grid (train_darcy.py).

    Inputs are standardised with train-set statistics (the reference uses
    sklearn StandardScaler, train_darcy.py); the stats ride along in
    ``result.norm_stats`` for held-out evaluation.
    """
    rng = np.random.default_rng(seed)
    n, nx, ny = a_field.shape
    gx, gy = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny), indexing="ij")
    pos = np.stack([gx, gy], -1).reshape(1, nx * ny, 2).astype(np.float32)

    model = _make_darcy_model(in_emb_dim, depth, heads)
    a_mean, a_std = float(a_field.mean()), float(a_field.std()) + 1e-12
    u_scale = float(np.abs(u_field).mean()) + 1e-12
    a_flat = jnp.asarray((a_field.reshape(n, nx * ny, 1) - a_mean) / a_std)
    u_flat = jnp.asarray(u_field.reshape(n, nx * ny, 1) / u_scale)
    parr = jnp.asarray(pos)

    p0 = jnp.broadcast_to(parr, (1, nx * ny, 2))
    inp0 = jnp.concatenate([a_flat[:1], p0], axis=-1)
    params = model.init(jax.random.PRNGKey(seed), inp0, p0)["params"]
    steps = max(epochs * (n // batch_size), 1)
    tx = optax.adamw(optax.cosine_decay_schedule(learning_rate, steps))
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rows):
        a = a_flat[rows]
        u = u_flat[rows]
        p = jnp.broadcast_to(parr, (rows.shape[0], nx * ny, 2))
        inp = jnp.concatenate([a, p], axis=-1)

        def loss_fn(pp):
            return rel_l2(model.apply({"params": pp}, inp, p), u)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for ep in range(epochs):
        order = rng.permutation(n)
        for b in range(0, n - batch_size + 1, batch_size):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(order[b : b + batch_size])
            )
        history.append({"epoch": ep, "rel_l2": float(loss)})
    return Generic1DResult(params=params, history=history,
                           norm_stats=(a_mean, a_std, u_scale))


# ---------------------------------------------------------------- held-out eval


def eval_oformer_burgers(
    params, data: np.ndarray, initial_step: int = 10, batch_size: int = 32,
    in_emb_dim: int = 64, depth: int = 3, heads: int = 4,
) -> float:
    """Mean next-step rel-L2 over all windows of held-out trajectories."""
    model = _make_burgers_model(initial_step, in_emb_dim, depth, heads)
    n, t, nx = data.shape
    pos = jnp.asarray(np.linspace(0, 1, nx, dtype=np.float32)[None, :, None])
    darr = jnp.asarray(data)

    @jax.jit
    def batch_rel(b_idx):
        def one(i, t0):
            win = jax.lax.dynamic_slice_in_dim(darr[i], t0, initial_step + 1, axis=0)
            return win[:initial_step].T, win[initial_step][:, None]

        x, y = jax.vmap(one)(b_idx[:, 0], b_idx[:, 1])
        p = jnp.broadcast_to(pos, (x.shape[0], nx, 1))
        inp = jnp.concatenate([x, p], axis=-1)
        return rel_l2(model.apply({"params": params}, inp, p), y)

    idx = np.stack(
        [np.repeat(np.arange(n), t - initial_step),
         np.tile(np.arange(t - initial_step), n)], axis=1
    ).astype(np.int32)
    tot, nb = 0.0, 0
    for b in range(0, len(idx) - batch_size + 1, batch_size):
        tot += float(batch_rel(jnp.asarray(idx[b : b + batch_size])))
        nb += 1
    return tot / max(nb, 1)


def eval_oformer_darcy(
    params, a_field: np.ndarray, u_field: np.ndarray, batch_size: int = 8,
    in_emb_dim: int = 64, depth: int = 3, heads: int = 4,
    norm_stats: tuple | None = None,
) -> float:
    model = _make_darcy_model(in_emb_dim, depth, heads)
    n, nx, ny = a_field.shape
    gx, gy = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny), indexing="ij")
    pos = jnp.asarray(np.stack([gx, gy], -1).reshape(1, nx * ny, 2).astype(np.float32))
    a_mean, a_std, u_scale = norm_stats if norm_stats else (0.0, 1.0, 1.0)
    a_flat = jnp.asarray((a_field.reshape(n, nx * ny, 1) - a_mean) / a_std)
    # rel-L2 is invariant to the constant u scale, but the model predicts in
    # scaled units, so the target must be scaled the same way
    u_flat = jnp.asarray(u_field.reshape(n, nx * ny, 1) / u_scale)

    @jax.jit
    def batch_rel(rows):
        p = jnp.broadcast_to(pos, (rows.shape[0], nx * ny, 2))
        inp = jnp.concatenate([a_flat[rows], p], axis=-1)
        return rel_l2(model.apply({"params": params}, inp, p), u_flat[rows])

    tot, nb = 0.0, 0
    for b in range(0, n, batch_size):
        rows = jnp.asarray(np.arange(b, min(b + batch_size, n)))
        tot += float(batch_rel(rows))
        nb += 1
    return tot / max(nb, 1)
