"""Transformer (VideoMAE operator) training drivers.

Capability parity with the reference transformer trainers:
  - 2D (``Transformer_2D_NS/Ours/train_transformer_aux_ns.py``):
    backbone/head LR groups with wd 1e-4 (:36-53), cosine over optimizer
    steps (:144-151), gradient accumulation (:239-256), fixed clip 5.0,
    loss = primary + aux_weight * aux (:232-243), best-primary-val
    checkpoint (:282-289), fp16 AMP -> bf16 on TPU (no GradScaler needed);
  - 3D (``Transformer_3D_NS/Ours/train_transformer_aux_ns_3d.py``): linear
    warmup -> cosine (SequentialLR, :134), clip 1.0;
  - ``nn.DataParallel`` (:137-139) -> batch-index sharding over the mesh.

TPU-first: gradient accumulation is ``optax.MultiSteps`` inside the one
jitted step (no python-side microbatch loop), and the aux stream runs
through the trunk in the same program as the primary.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sciml_pde_tpu.data.windows import epoch_batches, gather_windows
from sciml_pde_tpu.models.transformer import VideoMAEOperator, VideoMAEOperatorAux
from sciml_pde_tpu.parallel import make_mesh, replicate, shard_batch
from sciml_pde_tpu.train.optim import make_lr_schedule
from sciml_pde_tpu.utils.checkpoint import save_checkpoint
from sciml_pde_tpu.utils.logging import MetricLogger
from sciml_pde_tpu.train.fno_train import _STREAM_PIPELINE


def transformer_nrmse(pred: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """Per-sample nRMSE^2 over all non-batch dims (reference
    train_transformer_aux_ns.py:30-33), mean-reduced."""
    dims = tuple(range(1, pred.ndim))
    tgt_norm = jnp.mean(tgt**2, axis=dims, keepdims=True) + 1e-7
    return jnp.mean(jnp.mean((pred - tgt) ** 2, axis=dims, keepdims=True) / tgt_norm)


def transformer_nrmse_sqrt(pred: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """True per-sample nRMSE (the DR trainers' objective — reference
    Transformer_2D_DR/Baseline/train_transformer_rd.py:64-70 adds the
    sqrt that the NS variant lacks), mean-reduced."""
    dims = tuple(range(1, pred.ndim))
    mse = jnp.mean((pred - tgt) ** 2, axis=dims)
    denom = jnp.mean(tgt**2, axis=dims) + 1e-7
    return jnp.mean(jnp.sqrt(mse) / jnp.sqrt(denom))


def transformer_nrmse_perchannel(pred: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """Per-(sample, channel) true nRMSE, mean-reduced (channels last).

    Not a reference objective — added because joint normalization lets a
    near-zero-amplitude channel (the DR inhibitor at early frames) carry
    ~100% relative error unpunished (RESULTS.md per-channel analysis);
    normalizing per channel weights it equally."""
    dims = tuple(range(1, pred.ndim - 1))
    mse = jnp.mean((pred - tgt) ** 2, axis=dims)
    denom = jnp.mean(tgt**2, axis=dims) + 1e-7
    return jnp.mean(jnp.sqrt(mse / denom))


def fft_relative_l2(pred: jnp.ndarray, tgt: jnp.ndarray,
                    eps: float = 1e-20) -> jnp.ndarray:
    """Per-sample relative L2 in Fourier space over all non-batch dims
    (reference FftLpLoss, Transformer_2D_DR/Baseline_rollout/metrics.py:
    247-270, p=2, full spectrum), mean-reduced.  fp32 FFT regardless of
    compute dtype — bf16 spectra lose the small-amplitude channel."""
    dims = tuple(range(1, pred.ndim))
    pf = jnp.fft.fftn(pred.astype(jnp.float32), axes=dims)
    tf = jnp.fft.fftn(tgt.astype(jnp.float32), axes=dims)
    num = jnp.sqrt(jnp.sum(jnp.abs(pf - tf) ** 2, axis=dims))
    den = eps + jnp.sqrt(jnp.sum(jnp.abs(tf) ** 2, axis=dims))
    return jnp.mean(num / den)


_LOSSES = {
    "nrmse2": transformer_nrmse,
    "nrmse": transformer_nrmse_sqrt,
    "nrmse_perchannel": transformer_nrmse_perchannel,
}


def _make_loss(loss_type: str, fourier_weight: float):
    """Pixel loss, optionally + fourier_weight * relative-FFT-L2 (the
    reference's published DR recipe: nrmse + 0.1 * FftLpLoss,
    train_transformer_rd.py:210-212)."""
    base = _LOSSES[loss_type]
    if fourier_weight == 0.0:
        return base

    def loss(pred, tgt):
        return base(pred, tgt) + fourier_weight * fft_relative_l2(pred, tgt)

    return loss


def _head_group(path: tuple) -> str:
    top = str(path[0]) if path else ""
    return "heads" if top.startswith(("head_primary", "head_auxiliary")) else "backbone"


def make_transformer_optimizer(
    lr_share: float,
    lr_heads: float,
    total_steps: int,
    scheduler: str = "cosine",
    clip: float = 5.0,
    weight_decay: float = 1e-4,
    warmup_steps: int = 0,
    grad_accum: int = 1,
    scheduler_step: int = 100,
    scheduler_gamma: float = 0.5,
    swa_start: int | None = None,
    swa_lr_factor: float = 0.1,
) -> optax.GradientTransformation:
    def sched_for(lr):
        base = make_lr_schedule(scheduler, lr, max(total_steps - warmup_steps, 1),
                                scheduler_step, scheduler_gamma)
        if warmup_steps > 0:
            warm = optax.linear_schedule(0.0, lr, warmup_steps)
            base = optax.join_schedules([warm, base], [warmup_steps])
        if swa_start is not None:
            # SWALR semantics: constant lr*factor once the SWA window opens
            base = optax.join_schedules(
                [base, optax.constant_schedule(lr * swa_lr_factor)], [swa_start])
        return base

    def group_tx(lr):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(sched_for(lr)),
        )

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: _head_group(
                tuple(getattr(p, "key", getattr(p, "idx", p)) for p in path)
            ),
            params,
        )

    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.multi_transform(
            {"backbone": group_tx(lr_share), "heads": group_tx(lr_heads)}, label_fn
        ),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def _to_tf_layout(x):
    """(B, X, Y, T, C) window -> (B, T, H, W, C)."""
    return jnp.moveaxis(x, -2, 1)


def build_transformer_aux_step(
    model, tx, initial_step: int, num_aux_samples: int, auxiliary_weight: float,
    aux_row_map: np.ndarray | None = None, loss_type: str = "nrmse2",
    fourier_weight: float = 0.0, aux_resize_to: tuple[int, ...] | None = None,
):
    row_map = None if aux_row_map is None else np.asarray(aux_row_map, np.int32)
    loss = _make_loss(loss_type, fourier_weight)

    def _aux_to_model_res(a):
        """f32-cast + bilinear upsample of (B, *spatial, T, C) aux windows.

        The reference's if_downsample gather-time interpolate
        (utils_2d_ns.py:139-161): the resident aux store stays at its
        cheaper native resolution (4x less HBM at 128^2 vs 256^2)."""
        a = a.astype(jnp.float32)
        if aux_resize_to is not None and a.shape[1:-2] != tuple(aux_resize_to):
            target = (a.shape[0], *aux_resize_to, *a.shape[-2:])
            a = jax.image.resize(a, target, method="linear")
        return a

    def aux_indices(idx):
        p, t0 = idx[:, 0], idx[:, 1]
        if row_map is None:
            offs = jnp.arange(num_aux_samples, dtype=idx.dtype)
            ap = (p[:, None] * num_aux_samples + offs[None, :]).reshape(-1)
        else:
            ap = jnp.asarray(row_map)[p].reshape(-1)
        return jnp.stack([ap, jnp.repeat(t0, num_aux_samples)], axis=1)

    def loss_fn(params, x, y, xa, ya):
        pred_p, pred_a = model.apply({"params": params}, x, xa)
        lp = loss(pred_p, y)
        la = loss(pred_a, ya)
        return lp + auxiliary_weight * la, (lp, la)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, data_p, data_a, idx):
        x, y = gather_windows(data_p, idx, initial_step, 1)
        a_idx = aux_indices(idx)
        xa, ya = gather_windows(data_a, a_idx, initial_step, 1)
        # either store may live on device in bf16 (load_ns_aux
        # aux_store_dtype / store_dtype); compute in fp32 from the gather
        # on (the model casts to bf16 internally under mixed precision)
        f32 = jnp.float32
        x, y = x.astype(f32), y.astype(f32)
        xa, ya = _aux_to_model_res(xa), _aux_to_model_res(ya)
        x, xa = _to_tf_layout(x), _to_tf_layout(xa)
        yf, yaf = y[..., 0, :], ya[..., 0, :]  # next frame (B, H, W, C)
        (loss, (lp, la)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, yf, xa, yaf
        )
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (loss, lp, la), g_norm

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_xy(params, opt_state, x, y, xa, ya):
        """Host-streaming variant: windows arrive pre-gathered
        (data/stream.AuxHostWindowLoader) for stores beyond one chip's
        HBM — e.g. the NS aux pairing at 6 files x 1.6 GB."""
        x, xa = _to_tf_layout(x), _to_tf_layout(xa)
        yf, yaf = y[..., 0, :], ya[..., 0, :]
        (loss, (lp, la)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, yf, xa, yaf
        )
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (loss, lp, la), g_norm

    step.xy = step_xy

    @jax.jit
    def val_primary(params, data_p, idx):
        x, y = gather_windows(data_p, idx, initial_step, 1)
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        x = _to_tf_layout(x)
        pred_p, _ = model.apply({"params": params}, x, x)
        return loss(pred_p, y[..., 0, :])

    return step, val_primary


def build_transformer_baseline_step(model, tx, initial_step: int,
                                    loss_type: str = "nrmse2",
                                    fourier_weight: float = 0.0):
    loss = _make_loss(loss_type, fourier_weight)

    def loss_fn(params, x, y):
        pred = model.apply({"params": params}, x)
        return loss(pred, y)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, data, idx):
        x, y = gather_windows(data, idx, initial_step, 1)
        x = _to_tf_layout(x)
        loss_v, grads = jax.value_and_grad(loss_fn)(params, x, y[..., 0, :])
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_v, g_norm

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_xy(params, opt_state, x, y):
        """Host-streaming variant: windows arrive pre-gathered
        (data/stream.HostWindowLoader)."""
        x = _to_tf_layout(x)
        loss_v, grads = jax.value_and_grad(loss_fn)(params, x, y[..., 0, :])
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_v, g_norm

    step.xy = step_xy

    @jax.jit
    def val(params, data, idx):
        x, y = gather_windows(data, idx, initial_step, 1)
        return loss_fn(params, _to_tf_layout(x), y[..., 0, :])

    return step, val


@dataclasses.dataclass
class TransformerTrainResult:
    params: Any
    best_val: float
    history: list[dict]
    swa_params: Any = None  # average of the SWA-window epochs (if swa_frac>0)


def run_transformer_training(
    *,
    base_path: str,
    aux_path: str | None = None,
    dataset_family: str = "ns",  # ns | dr
    if_aux: bool = True,
    if_downsample: bool = False,
    sim_name: str = "ns_incom_inhom_2d_256",
    aux_name: str = "ns_aux_2d_256",
    test_range=(250, 275),
    train_subsample=(900, 900, 900),
    num_aux_samples: int = 24,
    auxiliary_weight: float = 0.7,
    img_size: int = 256,
    patch_size: int = 16,
    tubelet_size: int = 2,
    in_chans: int = 3,
    encoder_embed_dim: int = 768,
    encoder_depth: int = 12,
    encoder_num_heads: int = 12,
    decoder_embed_dim: int = 512,
    decoder_depth: int = 8,
    decoder_num_heads: int = 8,
    drop_path_rate: float = 0.0,
    use_checkpoint: bool = False,
    bf16: bool = True,
    initial_step: int = 10,
    rollout_test: int = 1,
    batch_size: int = 4,
    epochs: int = 100,
    learning_rate_share: float = 1e-3,
    learning_rate_heads: float = 1e-3,
    scheduler: str = "cosine",
    grad_accum: int = 1,
    clip: float = 5.0,
    warmup_steps: int = 0,
    model_update: int = 1,
    seed: int = 16,
    run_dir: str = "runs/transformer",
    model_name: str = "vmae_ns",
    continue_training: bool = False,
    pretrained_path: str | None = None,
    log_every: int = 50,
    loss_type: str = "nrmse2",  # nrmse2 (NS trainers) | nrmse (DR trainers)
    fourier_weight: float = 0.0,  # DR published recipe: 0.1
    aux_shared_head: bool = False,  # DR aux: no separate heads (ViT2dAux)
    swa_frac: float = 0.0,  # >0: average weights over the last frac of epochs
    swa_lr_factor: float = 0.1,  # SWALR: constant lr*factor inside the window
    early_window_boost: float = 0.0,  # >0: over-sample windows with t0 <=
    early_window_t0: int = 12,        # ..this, weight 1+boost (v-channel fix)
    aux_store_dtype: str | None = None,  # e.g. "bf16": device aux store dtype (NS)
    aux_upsample_at_gather: bool = False,  # NS: keep aux store at native res,
    # bilinear-upsample gathered windows inside the step (utils_2d_ns.py:139-161)
    primary_store_dtype: str | None = None,  # e.g. "bf16": device primary train store (NS)
    host_stream: bool = False,  # keep the train stores in host RAM and
    # stream pre-gathered window batches (stores beyond one chip's HBM;
    # the NS aux pairing at reference num_aux_samples=6 is ~9.5 GB)
    resident_rotate: int = 0,  # R>1: full pool in host RAM, 1/R trajectory
    # slice device-resident, swapped between epochs (the single-chip
    # beyond-HBM path — see train/fno_train.py for semantics)
    resident_rotate_schedule: str = "block",  # block | cyclic
) -> TransformerTrainResult:
    mesh = make_mesh()
    rng = np.random.default_rng(seed)
    logger = MetricLogger(run_dir, name=model_name, echo_every=1)

    resident_rotate = int(resident_rotate or 0)
    if resident_rotate > 1 and host_stream:
        raise ValueError("resident_rotate and host_stream are mutually exclusive")
    keep_host = host_stream or resident_rotate > 1

    aux_row_map = None
    if dataset_family == "ns":
        from sciml_pde_tpu.data.ns import load_ns_aux, load_ns_baseline

        if if_aux:
            ds = load_ns_aux(
                base_path, aux_path, train_subsample=tuple(train_subsample),
                num_aux_samples=num_aux_samples, initial_step=initial_step,
                rollout_test=rollout_test, sim_name=sim_name, aux_name=aux_name,
                if_downsample=if_downsample, test_range=test_range,
                to_device=not keep_host, aux_store_dtype=aux_store_dtype,
                store_dtype=primary_store_dtype,
                aux_upsample_at_gather=aux_upsample_at_gather,
            )
            train_w, test_w = ds.primary_train, ds.primary_test
            aux_row_map = ds.aux_row_map
        else:
            d = load_ns_baseline(
                base_path, train_subsample=train_subsample[0],
                initial_step=initial_step, rollout_test=rollout_test,
                sim_name=sim_name, test_range=test_range,
                to_device=not keep_host,
            )
            train_w, test_w, ds = d.train, d.test, d
    else:
        from sciml_pde_tpu.data.dr import load_dr_aux, load_dr_baseline

        if if_aux:
            ds = load_dr_aux(
                base_path, aux_path, train_subsample=tuple(train_subsample),
                num_aux_samples=num_aux_samples, initial_step=initial_step,
                rollout_test=rollout_test, if_downsample=if_downsample,
                to_device=not keep_host,
            )
            train_w, test_w = ds.primary_train, ds.primary_test
        else:
            d = load_dr_baseline(
                base_path, train_subsample=train_subsample[0],
                initial_step=initial_step, rollout_test=rollout_test,
                to_device=not keep_host,
            )
            train_w, test_w, ds = d.train, d.test, d

    kwargs = dict(
        img_size=img_size, patch_size=patch_size, tubelet_size=tubelet_size,
        in_chans=in_chans, num_frames=initial_step,
        encoder_dim=encoder_embed_dim, encoder_depth=encoder_depth,
        encoder_heads=encoder_num_heads, decoder_dim=decoder_embed_dim,
        decoder_depth=decoder_depth, decoder_heads=decoder_num_heads,
        drop_path_rate=drop_path_rate, use_checkpoint=use_checkpoint,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    model = (VideoMAEOperatorAux(**kwargs, shared_head=aux_shared_head)
             if if_aux else VideoMAEOperator(**kwargs))

    # Device-resident pool rotation (mirrors train/fno_train.py): re-lay
    # the aux store in pairing order so each resident primary slice owns
    # its contiguous aux rows, then place slice 0 on device.
    _rotate = None
    if resident_rotate > 1:
        from sciml_pde_tpu.utils.transfer import device_put_chunked

        R = resident_rotate
        n_total = train_w.num_trajectories
        if n_total % R:
            raise ValueError(
                f"resident_rotate={R} must divide the pool's "
                f"{n_total} trajectories"
            )
        n_res = n_total // R
        prim_host = np.asarray(train_w.data)
        aux_host_rot = None
        nA = num_aux_samples
        if if_aux:
            perm = (
                np.asarray(aux_row_map, np.int64).reshape(-1)
                if aux_row_map is not None
                else np.arange(n_total * nA, dtype=np.int64)
            )
            aux_host_rot = np.asarray(ds.aux_train.data)[perm]
            aux_row_map = None  # identity pattern in resident-local indices

        def _rotate(k: int, old_p=None, old_a=None):
            for buf in (old_p, old_a):
                if buf is not None:
                    jax.block_until_ready(buf)
                    buf.delete()
            p = device_put_chunked(prim_host[k * n_res:(k + 1) * n_res])
            a = None
            if aux_host_rot is not None:
                a = device_put_chunked(
                    aux_host_rot[k * n_res * nA:(k + 1) * n_res * nA]
                )
            return p, a

        # Initial slice load DEFERRED to the first epoch iteration (see
        # fno_train.py): a resume may start on a later slice, and an eager
        # _rotate(0) would waste one multi-GB transfer + one
        # staging-retention leak payload.  Until then train_w.data is a
        # zero-copy numpy VIEW of one slice (correct window_index /
        # steps-per-epoch shape); the model-init gather below reads the
        # view host-side (tiny).
        train_w.data = prim_host[:n_res]
        _rot_current = None

    train_idx = train_w.window_index()
    test_idx = test_w.window_index()
    steps_per_epoch = max(len(train_idx) // batch_size, 1)
    total_steps = epochs * steps_per_epoch // max(grad_accum, 1)

    # SWA window (reference train_transformer_aux_rd.py:139,225-228): the
    # last ``swa_frac`` of epochs run at a constant ``lr*swa_lr_factor``
    # and the returned swa_params are the plain average of the per-epoch
    # weights inside the window.
    swa_start_ep = epochs - max(int(epochs * swa_frac), 1) if swa_frac > 0 else None
    swa_start_step = (swa_start_ep * steps_per_epoch // max(grad_accum, 1)
                      if swa_start_ep is not None else None)

    tx = make_transformer_optimizer(
        learning_rate_share, learning_rate_heads, total_steps, scheduler,
        clip=clip, warmup_steps=warmup_steps, grad_accum=grad_accum,
        swa_start=swa_start_step, swa_lr_factor=swa_lr_factor,
    )

    x0, _ = gather_windows(train_w.data, jnp.asarray(train_idx[:1]), initial_step, 1)
    x0 = _to_tf_layout(x0)
    key = jax.random.PRNGKey(seed)
    if if_aux:
        params = model.init(key, x0, x0)["params"]
        aux_spatial = tuple(ds.aux_train.data.shape[2:-1])
        prim_spatial = tuple(train_w.data.shape[2:-1])
        step_fn, val_fn = build_transformer_aux_step(
            model, tx, initial_step, num_aux_samples, auxiliary_weight, aux_row_map,
            loss_type=loss_type, fourier_weight=fourier_weight,
            aux_resize_to=(prim_spatial if aux_spatial != prim_spatial else None),
        )
    else:
        params = model.init(key, x0)["params"]
        step_fn, val_fn = build_transformer_baseline_step(
            model, tx, initial_step, loss_type=loss_type,
            fourier_weight=fourier_weight,
        )

    opt_state = tx.init(params)

    if pretrained_path:
        # partial load of (e.g. masked-SSL) pretrained weights, key-filtered
        # (reference transformer.py:62-88)
        from sciml_pde_tpu.utils.checkpoint import load_partial_params, restore_checkpoint

        restored = restore_checkpoint(
            pretrained_path,
            {"params": params, "opt_state": opt_state,
             "meta": {"epoch": np.asarray(0), "loss": np.asarray(0.0)}},
        )
        params = load_partial_params(params, restored["params"])

    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    ckpt_path = Path(run_dir) / f"{model_name}_ckpt"
    best_val = float(np.inf)
    start_epoch = 0
    if continue_training and ckpt_path.exists():
        from sciml_pde_tpu.utils.checkpoint import restore_checkpoint

        restored = restore_checkpoint(
            ckpt_path,
            {"params": params, "opt_state": opt_state,
             "meta": {"epoch": np.asarray(0), "loss": np.asarray(0.0)}},
        )
        params = replicate(restored["params"], mesh)
        opt_state = replicate(restored["opt_state"], mesh)
        start_epoch = int(restored["meta"]["epoch"])
        best_val = float(restored["meta"]["loss"])

    stream_loader = None
    if host_stream:
        if early_window_boost > 0:
            raise NotImplementedError(
                "early_window_boost with host_stream: the stream loader "
                "controls sampling; use the device-store path for the DR "
                "early-window study"
            )
        from sciml_pde_tpu.data.stream import AuxHostWindowLoader, HostWindowLoader

        if if_aux:
            stream_loader = AuxHostWindowLoader(
                train_w.data, ds.aux_train.data, train_idx, initial_step, 1,
                batch_size, num_aux_samples, row_map=aux_row_map, seed=seed,
            )
        else:
            stream_loader = HostWindowLoader(
                train_w.data, train_idx, initial_step, 1, batch_size, seed=seed,
            )

    history: list[dict] = []
    gstep = 0
    best_state = None
    swa_params, swa_n = None, 0
    ckpt_dirty = False
    last_ckpt_t = 0.0
    ckpt_min_interval_s = 120.0
    # block schedule: one contiguous segment per slice (R-1 swaps per run,
    # not per pass) — the tunnel client retains every swap's staging
    # buffers, so per-epoch cyclic swapping leaks the host OOM-dead (see
    # fno_train._slice_for and PERFORMANCE.md)
    def _slice_for(ep: int) -> int:
        R = resident_rotate
        if resident_rotate_schedule == "cyclic":
            return ep % R
        if resident_rotate_schedule == "interleave":
            # two half-run passes: every slice sees both LR bands
            # (fno_train._slice_for has the rationale)
            half = max(epochs // 2, 1)
            ep_h, span = (ep, half) if ep < half else (ep - half, max(epochs - half, 1))
            return min((ep_h * R) // span, R - 1)
        return min((ep * R) // max(epochs, 1), R - 1)

    for ep in range(start_epoch, epochs):
        if _rotate is not None and _slice_for(ep) != _rot_current:
            jax.block_until_ready(params)
            k = _slice_for(ep)
            loaded = _rot_current is not None
            train_w.data, _new_aux = _rotate(
                k, old_p=train_w.data if loaded else None,
                old_a=ds.aux_train.data if (if_aux and loaded) else None,
            )
            if if_aux:
                ds.aux_train.data = _new_aux
            _rot_current = k
        # stage the epoch's batches on device up front, accumulate the loss
        # with eager adds — same dispatch-pipeline rules as the FNO trainer
        loss_acc = None
        if host_stream:
            # Bounded in-flight window (see fno_train): unbounded staging
            # of 256^2 NS-aux batches OOM-killed the host at ~130 GB RSS.
            from collections import deque

            inflight: deque = deque()
            nb = 0
            for batch in stream_loader:
                batch = shard_batch(batch, mesh)
                if if_aux:
                    x, y, xa, ya = batch
                    params, opt_state, (loss, lp, la), g_norm = step_fn.xy(
                        params, opt_state, x, y, xa, ya
                    )
                else:
                    x, y = batch
                    params, opt_state, loss, g_norm = step_fn.xy(
                        params, opt_state, x, y
                    )
                loss_acc = loss if loss_acc is None else loss_acc + loss
                nb += 1
                inflight.append(loss)
                if len(inflight) > _STREAM_PIPELINE:
                    jax.block_until_ready(inflight.popleft())
        else:
            if early_window_boost > 0:
                from sciml_pde_tpu.data.windows import weighted_epoch_batches

                w = 1.0 + early_window_boost * (train_idx[:, 1] <= early_window_t0)
                batches_iter = weighted_epoch_batches(train_idx, batch_size, rng, w)
            else:
                batches_iter = epoch_batches(train_idx, batch_size, rng)
            dev_batches = [shard_batch(b, mesh) for b in batches_iter]
            # Bound the device-resident dispatch pipeline too: the remote
            # AOT path ignores buffer donation, so every in-flight step
            # holds its own params+opt_state output copies (~2 GB each at
            # ViT-L scale) — an unbounded epoch of async dispatches
            # exhausts HBM at runtime and crashes the worker
            # (FAILED_PRECONDITION on the next host fetch).
            if if_aux:
                for k, bidx in enumerate(dev_batches):
                    params, opt_state, (loss, lp, la), g_norm = step_fn(
                        params, opt_state, train_w.data, ds.aux_train.data, bidx
                    )
                    loss_acc = loss if loss_acc is None else loss_acc + loss
                    if (k + 1) % _STREAM_PIPELINE == 0:
                        jax.block_until_ready(loss)
            else:
                for k, bidx in enumerate(dev_batches):
                    params, opt_state, loss, g_norm = step_fn(
                        params, opt_state, train_w.data, bidx
                    )
                    loss_acc = loss if loss_acc is None else loss_acc + loss
                    if (k + 1) % _STREAM_PIPELINE == 0:
                        jax.block_until_ready(loss)
            nb = len(dev_batches)
        gstep += nb
        if log_every and (gstep // log_every) != ((gstep - nb) // log_every):
            logger.log(gstep, train_loss=float(loss), grad_norm=float(g_norm), epoch=ep)
        tr_sum = float(loss_acc) if loss_acc is not None else 0.0

        if swa_start_ep is not None and ep >= swa_start_ep:
            # running mean of the per-epoch weights inside the SWA window
            swa_n += 1
            if swa_params is None:
                swa_params = jax.tree_util.tree_map(jnp.copy, params)
            else:
                w = 1.0 / swa_n
                swa_params = jax.tree_util.tree_map(
                    lambda a, p: a + (p.astype(a.dtype) - a) * w, swa_params, params)

        if ep % model_update == 0:
            val_sum, vb = 0.0, 0
            for b in range(0, len(test_idx), batch_size):
                chunk = jnp.asarray(test_idx[b : b + batch_size])
                v = val_fn(params, test_w.data, chunk)
                val_sum += float(v)
                vb += 1
            val_loss = val_sum / max(vb, 1)
            history.append({"epoch": ep, "train_loss": tr_sum / max(nb, 1), "val_loss": val_loss})
            logger.log(gstep, epoch=ep, val_loss=val_loss)
            if val_loss < best_val:
                # on-device best snapshot; the (multi-GB at full size) orbax
                # write is throttled and flushed after the last epoch
                best_val = val_loss
                best_state = (
                    jax.tree_util.tree_map(jnp.copy, params),
                    jax.tree_util.tree_map(jnp.copy, opt_state),
                    ep,
                )
                if time.time() - last_ckpt_t > ckpt_min_interval_s:
                    save_checkpoint(ckpt_path, best_state[0], best_state[1], ep, best_val)
                    last_ckpt_t = time.time()
                    ckpt_dirty = False
                else:
                    ckpt_dirty = True

    if ckpt_dirty and best_state is not None:
        save_checkpoint(ckpt_path, best_state[0], best_state[1], best_state[2], best_val)
    return TransformerTrainResult(params=params, best_val=best_val, history=history,
                                  swa_params=swa_params)
