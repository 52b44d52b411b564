"""Masked-SSL (VideoMAE-style) pretraining for the transformer operator.

The reference model carries a masked-SSL path (mask token + ``head_ssl``,
``Transformer_2D_NS/Ours/transformer.py:399-421,550-575``; ``ssl`` flag in
the trainer configs).  This driver implements the corresponding pretraining
loop: random token masking at a fixed ratio, MSE on the masked patches in
normalized space, with the resulting encoder loadable into the operator
trainers via ``pretrained_path`` (+ key-filtered partial loading).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sciml_pde_tpu.data.windows import epoch_batches, gather_windows
from sciml_pde_tpu.models.common import instance_norm_stats
from sciml_pde_tpu.models.transformer import VideoMAEOperator, patchify
from sciml_pde_tpu.parallel import make_mesh, replicate, shard_batch
from sciml_pde_tpu.utils.checkpoint import save_checkpoint
from sciml_pde_tpu.utils.logging import MetricLogger


def make_tube_mask(key, b: int, n_tokens: int, mask_ratio: float) -> jnp.ndarray:
    """Random per-sample token mask with a FIXED masked count (static
    shapes): True = masked."""
    n_masked = int(round(n_tokens * mask_ratio))
    scores = jax.random.uniform(key, (b, n_tokens))
    thresh = jnp.sort(scores, axis=1)[:, n_tokens - n_masked][:, None]
    return scores >= thresh


def run_ssl_pretraining(
    train_w,
    *,
    model_kwargs: dict,
    mask_ratio: float = 0.75,
    initial_step: int = 10,
    batch_size: int = 4,
    epochs: int = 10,
    learning_rate: float = 1.5e-4,
    run_dir: str = "runs/ssl",
    model_name: str = "vmae_ssl",
    seed: int = 16,
    log_every: int = 100,
):
    mesh = make_mesh()
    rng = np.random.default_rng(seed)
    logger = MetricLogger(run_dir, name=model_name)
    model = VideoMAEOperator(**model_kwargs, ssl=True)
    tubelet, patch = model.tubelet_size, model.patch_size

    idx = train_w.window_index()
    x0, _ = gather_windows(train_w.data, jnp.asarray(idx[:1]), initial_step, 0)
    x0 = jnp.moveaxis(x0, -2, 1)  # (B, T, H, W, C)
    b, t, h, w, c = x0.shape
    n_tokens = (t // tubelet) * (h // patch) * (w // patch)
    n_masked = int(round(n_tokens * mask_ratio))

    mask0 = jnp.asarray(make_tube_mask(jax.random.PRNGKey(0), 1, n_tokens, mask_ratio))
    params = model.init(jax.random.PRNGKey(seed), x0, mask0, True, n_masked)["params"]
    total = max(epochs * (len(idx) // batch_size), 1)
    tx = optax.adamw(optax.cosine_decay_schedule(learning_rate, total))
    opt_state = tx.init(params)

    def loss_fn(p, x, mask):
        pred = model.apply({"params": p}, x, mask, True, n_masked)  # (B, n_masked, patch_dim)
        std, mean = instance_norm_stats(x, (1, 2, 3))
        tokens = patchify((x - mean) / std, tubelet, patch)
        bb = tokens.shape[0]
        mask_idx = jnp.argsort(mask, axis=1, stable=True)[:, n_tokens - n_masked :]
        target = jnp.take_along_axis(tokens, mask_idx[..., None], axis=1)
        return jnp.mean((pred - target) ** 2)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, data, bidx, key):
        x, _ = gather_windows(data, bidx, initial_step, 0)
        x = jnp.moveaxis(x, -2, 1)
        mask = make_tube_mask(key, x.shape[0], n_tokens, mask_ratio)
        loss, grads = jax.value_and_grad(loss_fn)(params, x, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    key = jax.random.PRNGKey(seed)
    gstep = 0
    history = []
    for ep in range(epochs):
        for batch in epoch_batches(idx, batch_size, rng):
            bidx = shard_batch(batch, mesh)
            params, opt_state, loss = step(
                params, opt_state, train_w.data, bidx, jax.random.fold_in(key, gstep)
            )
            gstep += 1
            if gstep % log_every == 0:
                logger.log(gstep, ssl_loss=float(loss), epoch=ep)
        history.append({"epoch": ep, "ssl_loss": float(loss)})
    from pathlib import Path

    save_checkpoint(Path(run_dir) / f"{model_name}_ckpt", params, opt_state, epochs, float(loss))
    return params, history
