"""FNO training drivers (baseline + multiphysics aux joint training).

Capability parity:
  - baseline: reference ``pdebench/models/fno/train.py:43-347`` — nRMSE loss,
    Adam(wd=1e-4), cosine/StepLR, adaptive clip max(5, 0.1*||g||),
    ``training_type in {single, autoregressive}``, best-val checkpointing,
    eval path producing the six metrics.
  - aux: reference ``fno_aux/fno_train_aux.py`` — 6-tuple batches, aux batch
    flattening [B, nA, ...] -> [B*nA, ...], three LR groups
    (shared/primary-head/aux-head), loss = primary + aux_weight * aux,
    best-*primary*-val checkpointing.

TPU-first design:
  - the whole step (window gather from HBM-resident trajectories, forward,
    loss, backward, adaptive clip, Adam, LR schedule) is ONE jitted program
    with donated params/opt_state;
  - data parallelism = batch-index sharding over the 'data' mesh axis: the
    trajectory store is replicated, the per-step window indices are sharded,
    XLA partitions the gather and inserts the gradient all-reduce (replaces
    nn.DataParallel);
  - teacher-forced autoregressive training is a ``lax.scan`` over the
    window, not a python loop.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from sciml_pde_tpu.data.dr import load_dr_aux, load_dr_baseline
from sciml_pde_tpu.data.windows import epoch_batches, gather_windows
from sciml_pde_tpu.metrics import nrmse_loss
from sciml_pde_tpu.models import FNO2d, FNO2dAux, FNO3d, FNO3dAux
from sciml_pde_tpu.parallel import make_mesh, replicate, replicated_sharding, shard_batch
from sciml_pde_tpu.train.optim import aux_group_of, make_grouped_optimizer, make_optimizer
from sciml_pde_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from sciml_pde_tpu.utils.logging import MetricLogger

# Max async-dispatched host-stream batches in flight; each holds its host
# transfer buffer until the device dequeues it, so this bounds host RSS at
# ~pipeline_depth x batch_bytes instead of a full epoch of staged batches.
_STREAM_PIPELINE = 8


def _broadcast_grid(grid: jnp.ndarray, b: int) -> jnp.ndarray:
    return jnp.broadcast_to(grid[None], (b,) + grid.shape)


# --------------------------------------------------------------------------
# step builders
# --------------------------------------------------------------------------


def build_baseline_step(
    model,
    tx,
    initial_step: int,
    rollout: int,
    training_type: str = "single",
    t_train: int | None = None,
    lie_augment: bool = False,
    train_gather=None,
):
    """One jitted optimizer step for the baseline FNO.

    Batch = (B, 2) int32 window indices into the trajectory store.
    With ``lie_augment`` the gathered NS window is Lie-transformed on device
    inside the step (reference applies LPSNavierStokes in DataLoader
    workers, fno/utils_2d_ns_baseline_lie.py:161-209).
    ``train_gather`` overrides the train-store gather (sharded-store path);
    validation always uses the plain gather on the replicated test store.
    """
    train_gather = train_gather or gather_windows

    def single_loss(params, x, y, grid):
        pred = model.apply({"params": params}, x, grid)
        return nrmse_loss(pred, y)

    def ar_body(params, xx, yt, grid):
        # teacher-forced unroll step (reference fno/train.py:235-258): the
        # model predicts from the current window, the loss accumulates, and
        # the TRUE frame slides into the window.
        pred = model.apply({"params": params}, xx, grid)
        loss_t = nrmse_loss(pred, yt)
        xx = jnp.concatenate([xx[..., 1:, :], yt], axis=-2)
        return xx, loss_t

    if training_type == "autoregressive":
        gather_rollout = (t_train or initial_step + rollout) - initial_step

        def loss_fn(params, x, y, grid):
            # y: (B, *sp, T_out, C) -> scan over (T_out, B, *sp, 1, C)
            ys = jnp.moveaxis(y, -2, 0)[..., None, :]
            _, losses = jax.lax.scan(
                lambda xx, yt: ar_body(params, xx, yt, grid), x, ys
            )
            return jnp.sum(losses)

    else:
        loss_fn = single_loss
        gather_rollout = rollout

    def maybe_augment(x, y, key):
        if not lie_augment:
            return x, y
        from sciml_pde_tpu.sim.lie import augment_ns_window

        win = jnp.concatenate([x, y], axis=-2)
        keys = jax.random.split(key, win.shape[0])
        win = jax.vmap(augment_ns_window)(win, keys)
        return win[..., :initial_step, :], win[..., initial_step:, :]

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, data, grid, idx, key):
        x, y = train_gather(data, idx, initial_step, gather_rollout)
        # the train store may live on device in bf16 (load_ns_baseline
        # store_dtype); compute stays fp32 from the gather on
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        x, y = maybe_augment(x, y, key)
        gb = _broadcast_grid(grid, idx.shape[0])
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, gb)
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, g_norm

    @jax.jit
    def val_loss(params, data, grid, idx):
        x, y = gather_windows(data, idx, initial_step, gather_rollout)
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        gb = _broadcast_grid(grid, idx.shape[0])
        return loss_fn(params, x, y, gb)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_xy(params, opt_state, x, y, grid, key):
        """Host-streaming variant: windows arrive pre-gathered (data/stream.py)."""
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        x, y = maybe_augment(x, y, key)
        gb = _broadcast_grid(grid, x.shape[0])
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, gb)
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, g_norm

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_scan(params, opt_state, data, grid, idx_chunk, key):
        """K optimizer steps in ONE dispatch (lax.scan over a (K, B, 2)
        window-index chunk).  Amortizes host->device dispatch overhead —
        the production train-loop shape on TPU, where the per-step python
        loop is launch-bound at small model/grid sizes."""
        keys = jax.random.split(key, idx_chunk.shape[0])

        def body(carry, sk):
            params, opt_state = carry
            idx, k = sk
            x, y = train_gather(data, idx, initial_step, gather_rollout)
            x, y = x.astype(jnp.float32), y.astype(jnp.float32)
            x, y = maybe_augment(x, y, k)
            gb = _broadcast_grid(grid, idx.shape[0])
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y, gb)
            g_norm = optax.global_norm(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, g_norm)

        (params, opt_state), (losses, g_norms) = jax.lax.scan(
            body, (params, opt_state), (idx_chunk, keys)
        )
        return params, opt_state, losses, g_norms

    step.xy = step_xy
    step.scan = step_scan
    return step, val_loss


def build_aux_step(
    model,
    tx,
    initial_step: int,
    rollout: int,
    num_aux_samples: int,
    auxiliary_weight: float,
    aux_row_map: np.ndarray | None = None,
    train_gather=None,
    aux_chunks: int = 1,
    aux_resize_to: tuple[int, ...] | None = None,
    aux_native_grid: jnp.ndarray | None = None,
):
    """One jitted optimizer step for two-head aux joint training.

    Aux pairing: by default the DR scheme (reference
    fno_aux/utils_2d_rd.py:131-146) — primary trajectory p pairs with aux
    trajectories p*nA + (0..nA-1) at the same t0, aux batch flattened to
    B*nA.  ``aux_row_map`` ((Np, nA) int32) overrides it for per-file
    pairings like NS (fno_aux/utils_2d_ns.py:82-106).

    Large aux volumes (reference ``num_aux_samples: 24`` = batch 8 primary
    + 192 aux windows per step, config_ns.yaml:19,31):

      - ``aux_chunks > 1`` scans the auxiliary stream in equal chunks
        with a rematerialized body, so HLO temps are one chunk's worth
        while the gradient is mathematically identical (instance norm is
        per-sample; chunk-mean of equal chunks = batch mean).
      - ``aux_resize_to`` upsamples gathered aux windows (input AND
        target) to the primary spatial resolution *inside* the step —
        the reference's ``if_downsample`` gather-time interpolate
        (utils_2d_ns.py:139-161) — so the resident aux store can live at
        its cheaper native resolution.
      - ``aux_native_grid`` (mutually exclusive with ``aux_resize_to``)
        runs the aux stream AT the store's native resolution instead —
        the FNO backbone is discretization-invariant (shared spectral
        weights at modes << N), so the aux forward costs 4x less at a
        128^2 store under a 256^2 primary.  Beyond the reference (which
        always interpolates, utils_2d_ns.py:142); the supervision signal
        is the same fields on a coarser grid.
    """
    row_map = None if aux_row_map is None else np.asarray(aux_row_map, np.int32)
    train_gather = train_gather or gather_windows

    def aux_indices(idx):
        p = idx[:, 0]
        t0 = idx[:, 1]
        if row_map is None:
            offs = jnp.arange(num_aux_samples, dtype=idx.dtype)
            ap = (p[:, None] * num_aux_samples + offs[None, :]).reshape(-1)
        else:
            ap = jnp.asarray(row_map)[p].reshape(-1)
        at = jnp.repeat(t0, num_aux_samples)
        return jnp.stack([ap, at], axis=1)

    def _aux_to_model_res(a):
        """f32-cast + bilinear upsample of (B, *spatial, T, C) aux windows."""
        a = a.astype(jnp.float32)
        if aux_resize_to is not None and a.shape[1:-2] != tuple(aux_resize_to):
            target = (a.shape[0], *aux_resize_to, *a.shape[-2:])
            a = jax.image.resize(a, target, method="linear")
        return a

    if aux_resize_to is not None and aux_native_grid is not None:
        raise ValueError("aux_resize_to and aux_native_grid are exclusive")
    chunked = (
        aux_chunks > 1 or aux_resize_to is not None or aux_native_grid is not None
    )

    def loss_fn(params, x, y, xa, ya, grid, grid_a):
        pred_p, pred_a = model.apply({"params": params}, x, grid, xa, grid_a)
        lp = nrmse_loss(pred_p, y)
        la = nrmse_loss(pred_a, ya)
        return lp + auxiliary_weight * la, (lp, la)

    def loss_fn_chunked(params, x, y, xa, ya, grid):
        """Primary pass + scanned aux chunks (xa/ya still in store dtype/res)."""
        pred_p = model.apply({"params": params}, x, grid, method="primary")
        lp = nrmse_loss(pred_p, y)

        n_aux = xa.shape[0]
        if n_aux % aux_chunks:
            raise ValueError(
                f"aux batch {n_aux} not divisible by aux_chunks={aux_chunks}"
            )
        cb = n_aux // aux_chunks
        xa_s = xa.reshape(aux_chunks, cb, *xa.shape[1:])
        ya_s = ya.reshape(aux_chunks, cb, *ya.shape[1:])
        # ``grid`` arrives already batch-broadcast for the primary pass
        ga = _broadcast_grid(
            grid[0] if aux_native_grid is None else aux_native_grid, cb
        )

        @jax.checkpoint
        def body(acc, chunk):
            xa_c, ya_c = chunk
            pred_a = model.apply(
                {"params": params}, _aux_to_model_res(xa_c), ga, method="auxiliary"
            )
            return acc + nrmse_loss(pred_a, _aux_to_model_res(ya_c)), None

        la_sum, _ = jax.lax.scan(body, jnp.float32(0.0), (xa_s, ya_s))
        la = la_sum / aux_chunks
        return lp + auxiliary_weight * la, (lp, la)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, data_p, data_a, grid, idx):
        x, y = train_gather(data_p, idx, initial_step, rollout)
        a_idx = aux_indices(idx)
        xa, ya = train_gather(data_a, a_idx, initial_step, rollout)
        # either store may live on device in bf16 (load_ns_aux
        # aux_store_dtype / store_dtype); compute stays fp32 from the
        # gather on
        f32 = jnp.float32
        x, y = x.astype(f32), y.astype(f32)
        gb = _broadcast_grid(grid, idx.shape[0])
        if chunked:
            (loss, (lp, la)), grads = jax.value_and_grad(
                loss_fn_chunked, has_aux=True
            )(params, x, y, xa, ya, gb)
        else:
            xa, ya = xa.astype(f32), ya.astype(f32)
            ga = _broadcast_grid(grid, a_idx.shape[0])
            (loss, (lp, la)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, xa, ya, gb, ga
            )
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (loss, lp, la), g_norm

    def loss_fn_split(params, x, y, xa, ya, gb, ga):
        # mixed-resolution streams can't share the joint concatenated
        # pass; method-split is output-identical (test_aux_chunked.py::
        # test_method_split_matches_joint_call)
        pred_p = model.apply({"params": params}, x, gb, method="primary")
        lp = nrmse_loss(pred_p, y)
        pred_a = model.apply({"params": params}, xa, ga, method="auxiliary")
        la = nrmse_loss(pred_a, ya)
        return lp + auxiliary_weight * la, (lp, la)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_xy(params, opt_state, x, y, xa, ya, grid):
        """Host-streaming variant: windows arrive pre-gathered
        (data/stream.AuxHostWindowLoader).  With ``aux_native_grid`` the
        aux windows arrive at the store's native resolution and the aux
        stream runs there (same lever as the device-store path)."""
        f32 = jnp.float32
        x, y, xa, ya = x.astype(f32), y.astype(f32), xa.astype(f32), ya.astype(f32)
        gb = _broadcast_grid(grid, x.shape[0])
        if aux_native_grid is None:
            ga = _broadcast_grid(grid, xa.shape[0])
            lfn = loss_fn
        else:
            ga = _broadcast_grid(aux_native_grid, xa.shape[0])
            lfn = loss_fn_split
        (loss, (lp, la)), grads = jax.value_and_grad(lfn, has_aux=True)(
            params, x, y, xa, ya, gb, ga
        )
        g_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, (loss, lp, la), g_norm

    step.xy = step_xy

    @jax.jit
    def val_primary_loss(params, data_p, grid, idx):
        # validation scores the primary head only (fno_train_aux.py:400-410);
        # feed the primary stream to both inputs, discard the aux output.
        x, y = gather_windows(data_p, idx, initial_step, rollout)
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        gb = _broadcast_grid(grid, idx.shape[0])
        pred_p, _ = model.apply({"params": params}, x, gb, x, gb)
        return nrmse_loss(pred_p, y)

    return step, val_primary_loss


# --------------------------------------------------------------------------
# run_training: the L4 entry point
# --------------------------------------------------------------------------


@dataclasses.dataclass
class FNOTrainResult:
    params: Any
    best_val: float
    history: list[dict]


def run_training(
    *,
    base_path: str,
    aux_path: str | None = None,
    dataset_family: str = "dr",  # dr | ns
    lie_augment: bool = False,
    sim_name: str = "ns_incom_inhom_2d_256",
    aux_name: str = "ns_aux_2d_256",
    test_range=(250, 275),
    if_aux: bool = False,
    if_downsample: bool = False,
    aux_file: str | None = None,
    model_family: str = "fno",  # fno | transformer3d
    transformer_kwargs: dict | None = None,
    extra_train_files: list | None = None,
    train_subsample=(900, 900, 900),
    num_aux_samples: int = 3,
    auxiliary_weight: float = 0.7,
    aux_store_dtype: str | None = None,  # e.g. "bf16": device aux store dtype (NS family)
    aux_chunks: int = 1,  # scan the aux stream in K remat'd chunks per step
    aux_upsample_at_gather: bool = False,  # NS: keep aux store at native res,
    # bilinear-upsample gathered windows inside the step (utils_2d_ns.py:139-161)
    aux_native_compute: bool = False,  # run the aux stream AT the store's
    # native resolution (FNO is discretization-invariant) — 4x cheaper aux
    # forward at a 128^2 store; requires aux_upsample_at_gather
    fno_remat: bool = False,  # rematerialize FNO spectral blocks on backward
    primary_store_dtype: str | None = None,  # e.g. "bf16": device primary train store (NS)
    modes: int = 12,
    width: int = 20,
    initial_step: int = 10,
    rollout_test: int = 1,
    t_train: int = 101,
    num_channels: int = 2,
    batch_size: int = 4,
    epochs: int = 100,
    learning_rate: float = 1e-3,
    learning_rate_share: float = 1e-3,
    learning_rate_fc2: float = 1e-3,
    scheduler: str = "cosine",
    scheduler_step: int = 100,
    scheduler_gamma: float = 0.5,
    training_type: str = "single",
    if_training: bool = True,
    iLow: int = 4,
    iHigh: int = 12,
    plot: bool = False,
    channel_plot: int = 0,
    model_update: int = 1,
    seed: int = 16,
    run_dir: str = "runs/fno",
    model_name: str = "fno2d_dr",
    continue_training: bool = False,
    log_every: int = 50,
    shard_store: bool = False,
    host_stream: bool = False,
    resident_rotate: int = 0,
    dr_leaky_clip: bool = False,  # replicate the reference's [:N] train-list
    # clip incl. the test tail (audit-only; data/dr.py:_load_train_pool)
    resident_rotate_schedule: str = "block",  # block | interleave | cyclic
    fast_step: bool | None = None,  # fused-Pallas step (None: SCIML_FAST_STEP env)
) -> FNOTrainResult:
    """Train a (possibly aux two-head) FNO on the DR dataset family.

    Mirrors reference fno/train.py:43 and fno_aux/fno_train_aux.py:43.

    ``resident_rotate=R`` (R > 1) trains on a pool R times larger than
    one chip's HBM allows device-resident: the full primary (+aux) pool
    stays in host RAM and a 1/R trajectory slice lives on device,
    swapped between epochs via bounded chunked transfers
    (utils/transfer.py).  Epoch ``ep`` trains on slice ``ep % R``, so R
    consecutive epochs make one full pass over the pool (block-cyclic
    data order).  This is the single-chip answer to the host-stream
    path, which this backend's staging-retention leak closes at NS
    shapes (PERFORMANCE.md): rotation does O(1) large transfers per
    epoch instead of O(steps), and each resident slice trains at full
    device-gather throughput.
    """
    mesh = make_mesh()
    rng = np.random.default_rng(seed)
    logger = MetricLogger(run_dir, name=model_name, echo_every=1)

    resident_rotate = int(resident_rotate or 0)
    if resident_rotate > 1 and (host_stream or shard_store):
        raise ValueError(
            "resident_rotate is the device-resident pool-rotation lever; "
            "it composes with neither host_stream nor shard_store"
        )
    if (
        resident_rotate > 1
        and resident_rotate_schedule == "interleave"
        and epochs < 2 * resident_rotate
    ):
        # each half-run must visit every slice: with epochs//2 < R the
        # (ep_h*R)//span map skips the tail slices entirely (ADVICE r4) —
        # e.g. epochs=6, R=4 never trains slice 3
        raise ValueError(
            f"resident_rotate_schedule='interleave' needs epochs >= "
            f"2*resident_rotate so both half-runs visit every slice "
            f"(got epochs={epochs}, resident_rotate={resident_rotate}); "
            f"use schedule='block' or raise epochs"
        )
    if host_stream and shard_store:
        raise ValueError("host_stream and shard_store are mutually exclusive")
    if host_stream and aux_chunks > 1:
        raise ValueError(
            "aux_chunks is a device-store lever; the host-stream path "
            "ships pre-gathered windows (the shipped batch is already the "
            "memory granularity)"
        )
    if host_stream and aux_upsample_at_gather and not aux_native_compute:
        raise ValueError(
            "the in-step upsample is a device-store lever; with "
            "host_stream either ship pre-upsampled windows (default) or "
            "run the aux stream at native res (aux_native_compute)"
        )

    # fused-Pallas fast path: only the plain 2D FNO baseline single-step
    # configuration is fused (train/fast_step.py); validate the request
    # BEFORE any data loading
    _fast_requested = (
        fast_step
        if fast_step is not None
        else os.environ.get("SCIML_FAST_STEP", "").lower() in ("1", "true")
    )
    _fast_compatible = (
        not if_aux and model_family == "fno"
        and training_type == "single" and rollout_test == 1
        and not lie_augment and not shard_store and not host_stream
        and resident_rotate <= 1 and scheduler == "cosine"
        # the fused step is a plain jit around pallas_call with no
        # partitioning rule: on a multi-chip data mesh it would silently
        # replicate (or fail to compile) against P('data')-sharded batch
        # indices (ADVICE r4) — single-device only on real TPU.  Off-TPU
        # the kernels run in interpreter mode where jit auto-gathers the
        # sharded indices with exact semantics (asserted step-for-step by
        # tests/test_fast_step.py on the 8-device CPU mesh).
        and (mesh.shape["data"] == 1 or jax.default_backend() != "tpu")
    )
    if _fast_requested and not _fast_compatible:
        if fast_step:  # explicit request for an unsupported configuration
            raise ValueError(
                "fast_step=True requires the plain 2D FNO baseline path "
                "(no aux/3D/autoregressive/lie/shard/stream/rotation, "
                "rollout_test=1, cosine schedule) on a single-device mesh"
            )
        _fast_requested = False

    # host_stream and pool rotation both need the train stores to stay in
    # host RAM after loading (rotation then places one slice on device)
    keep_host = host_stream or resident_rotate > 1

    aux_row_map = None
    if if_aux:
        if dataset_family == "ns":
            from sciml_pde_tpu.data.ns import load_ns_aux

            ds = load_ns_aux(
                base_path, aux_path, train_subsample=tuple(train_subsample),
                num_aux_samples=num_aux_samples, initial_step=initial_step,
                rollout_test=rollout_test, sim_name=sim_name, aux_name=aux_name,
                if_downsample=if_downsample, test_range=test_range,
                to_device=not keep_host, aux_store_dtype=aux_store_dtype,
                store_dtype=primary_store_dtype,
                aux_upsample_at_gather=aux_upsample_at_gather,
            )
            aux_row_map = ds.aux_row_map
        elif dataset_family == "ns3d":
            from sciml_pde_tpu.data.ns3d import load_ns3d_aux

            ds = load_ns3d_aux(
                base_path, aux_path, train_subsample=tuple(train_subsample),
                num_aux_samples=num_aux_samples, initial_step=initial_step,
                rollout_test=rollout_test, test_seeds=range(*test_range),
                to_device=not keep_host, aux_store_dtype=aux_store_dtype,
                store_dtype=primary_store_dtype,
            )
        else:
            ds = load_dr_aux(
                base_path, aux_path, train_subsample=tuple(train_subsample),
                num_aux_samples=num_aux_samples, initial_step=initial_step,
                rollout_test=rollout_test, if_downsample=if_downsample,
                aux_file=aux_file, extra_train_files=extra_train_files,
                to_device=not keep_host,
            )
        train_w, test_w = ds.primary_train, ds.primary_test
    else:
        if dataset_family == "ns":
            from sciml_pde_tpu.data.ns import load_ns_baseline

            ds = load_ns_baseline(
                base_path, train_subsample=train_subsample[0],
                initial_step=initial_step, rollout_test=rollout_test,
                sim_name=sim_name, test_range=test_range,
                to_device=not keep_host, store_dtype=primary_store_dtype,
            )
            train_w, test_w = ds.train, ds.test
        elif dataset_family == "ns3d":
            from sciml_pde_tpu.data.ns3d import load_ns3d_aux

            ds = load_ns3d_aux(
                base_path, aux_path, train_subsample=tuple(train_subsample),
                num_aux_samples=num_aux_samples, initial_step=initial_step,
                rollout_test=rollout_test, test_seeds=range(*test_range),
                to_device=not keep_host, with_aux=False,
                store_dtype=primary_store_dtype,
            )
            train_w, test_w = ds.primary_train, ds.primary_test
        else:
            ds = load_dr_baseline(
                base_path, train_subsample=train_subsample[0],
                initial_step=initial_step, rollout_test=rollout_test,
                extra_train_files=extra_train_files,
                to_device=not keep_host,
                leaky_clip=dr_leaky_clip,
            )
            train_w, test_w = ds.train, ds.test

    # pick 2D/3D model by probing sample ndim, as the reference does
    # (fno/train.py:109-129): trajectory store (N, T, *spatial, C)
    is_3d = train_w.data.ndim == 6
    if model_family == "transformer3d":
        # 3D VideoMAE wrappers share the FNO call signature, so the same
        # jitted aux/baseline steps drive them (reference
        # Transformer_3D_NS trainers mirror the FNO-aux pipeline).
        from sciml_pde_tpu.models.transformer3d import (
            Transformer3DAux,
            Transformer3DBaseline,
        )

        spatial = tuple(train_w.data.shape[2:5])
        core = dict(
            img_size=spatial,
            patch_size=tuple(transformer_kwargs.get("patch_size", (10, 10, 9)))
            if transformer_kwargs else (10, 10, 9),
            tubelet_size=(transformer_kwargs or {}).get("tubelet_size", 5),
            in_chans=num_channels,
            num_frames=initial_step,
        )
        for k in ("encoder_dim", "encoder_depth", "encoder_heads",
                  "decoder_dim", "decoder_depth", "decoder_heads",
                  "drop_path_rate", "use_checkpoint"):
            if transformer_kwargs and k in transformer_kwargs:
                core[k] = transformer_kwargs[k]
        model = Transformer3DAux(core_kwargs=core) if if_aux else Transformer3DBaseline(core_kwargs=core)
    elif if_aux:
        model = (
            FNO3dAux(num_channels=num_channels, modes1=modes, modes2=modes,
                     modes3=modes, width=width, initial_step=initial_step,
                     remat=fno_remat)
            if is_3d
            else FNO2dAux(num_channels=num_channels, modes1=modes, modes2=modes,
                          width=width, initial_step=initial_step, remat=fno_remat)
        )
    else:
        model = (
            FNO3d(num_channels=num_channels, modes1=modes, modes2=modes,
                  modes3=modes, width=width, initial_step=initial_step,
                  remat=fno_remat)
            if is_3d
            else FNO2d(num_channels=num_channels, modes1=modes, modes2=modes,
                       width=width, initial_step=initial_step, remat=fno_remat)
        )

    # Device-resident pool rotation: keep the full pool host-side, place
    # slice 0 on device now; _rotate_resident swaps slices between epochs.
    # The aux store is re-laid in pairing order first (the same identity-
    # pattern trick the shard_store path uses below), so every resident
    # primary slice owns exactly the matching contiguous aux slice and
    # the in-step pairing is ``p -> p*nA + j`` in resident-local indices.
    # Data-order trade-off vs the reference's global shuffle: each epoch
    # shuffles only WITHIN the resident slice, so a batch never mixes
    # trajectories across slices; the default "block" schedule gives each
    # slice one contiguous epoch segment (leak-bounded on this backend —
    # see _slice_for below), "cyclic" interleaves slices per epoch.
    # CONFOUND (not just batch statistics): under a decaying LR schedule
    # "block" trains each slice in exactly one LR band (late slices only
    # ever see low LR), so rotated results are NOT directly comparable to
    # non-rotated or reference (globally shuffled) runs — rotated run
    # summaries must record the schedule (experiments/ns_production.py
    # does).  "interleave" gives every slice one segment in each LR half
    # at 2R-1 swaps per run (still leak-bounded); "cyclic" matches the
    # reference order best but costs R-1 swaps per EPOCH (host-OOM on
    # this backend, see _slice_for).
    # Gated on if_training: the eval path never reads the train pool, so
    # eval-only runs skip the multi-GB slice load (model-init templates
    # come from the test store in that case).
    _rotate = None
    if resident_rotate > 1 and if_training:
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
            # Re-lay into pairing order, but skip the full host copy when
            # the permutation is the identity (aux pool already laid out
            # as p*nA+j): the copy would transiently double host RSS for
            # a store family that is host-OOM-sensitive.
            aux_host_rot = np.asarray(ds.aux_train.data)
            if aux_row_map is not None:
                perm = np.asarray(aux_row_map, np.int64).reshape(-1)
                if len(perm) != len(aux_host_rot) or not np.array_equal(
                    perm, np.arange(len(perm))
                ):
                    aux_host_rot = aux_host_rot[perm]
            elif len(aux_host_rot) != n_total * nA:
                if len(aux_host_rot) < n_total * nA:
                    # slicing would silently no-op and later gathers would
                    # clamp to repeated last rows — fail like the fancy
                    # index on an undersized pool always did
                    raise ValueError(
                        f"aux pool has {len(aux_host_rot)} rows; rotation "
                        f"needs n_total*num_aux_samples = {n_total * nA}"
                    )
                aux_host_rot = aux_host_rot[: n_total * nA]
            aux_row_map = None  # identity pattern in resident-local indices

        def _rotate(k: int, old_p=None, old_a=None):
            # The remote backend ignores donation, so delete the outgoing
            # buffers BEFORE building the incoming ones: the chunked build
            # transiently peaks at ~2x the slice (PERFORMANCE.md), and the
            # old slice must not still be holding HBM under that peak.
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

        # The initial slice load is DEFERRED to the first epoch iteration:
        # with continue_training the start epoch may map to a later slice,
        # and an eager _rotate(0) here would waste one multi-GB transfer
        # plus one staging-retention leak payload on every resume.  Until
        # then train_w.data is a zero-copy numpy VIEW of one slice, so all
        # shape-derived bookkeeping (window_index, steps/epoch) sees the
        # resident-slice shape; model init gathers from the test store.
        train_w.data = prim_host[:n_res]
        _rot_current = None

    train_idx = train_w.window_index()
    test_idx = test_w.window_index()

    # Sharded trajectory store (TPU-native scalability beyond one chip's
    # HBM): trajectories split over the 'data' axis, per-shard gather via
    # shard_map, sampler constrained so each device only indexes its local
    # shard.  Validation keeps the (small) test store replicated.
    train_gather = None
    n_shards = mesh.shape["data"]
    if shard_store:
        from sciml_pde_tpu.data.windows import sharded_gather_windows
        from sciml_pde_tpu.parallel import trajectory_sharding

        if train_w.num_trajectories % n_shards or batch_size % n_shards:
            raise ValueError(
                f"shard_store needs n_traj ({train_w.num_trajectories}) and "
                f"batch_size ({batch_size}) divisible by the data axis ({n_shards})"
            )
        tsh = trajectory_sharding(mesh)
        train_w.data = jax.device_put(train_w.data, tsh)
        if if_aux:
            # Re-lay (and trim) the aux store into pairing order so the
            # pairing becomes the identity pattern in SHARD-LOCAL indices:
            # after aux[perm], primary p's aux rows are p*nA..(p+1)*nA-1,
            # so each shard's contiguous primary slice owns exactly the
            # matching contiguous aux slice under trajectory_sharding.
            # This covers both the NS per-file row map and the DR identity
            # pairing with an oversized aux pool (which would otherwise
            # misalign across shard boundaries).
            n_aux = num_aux_samples
            perm = (
                np.asarray(aux_row_map, np.int64).reshape(-1)
                if aux_row_map is not None
                else np.arange(train_w.num_trajectories * n_aux, dtype=np.int64)
            )
            aux_host = np.asarray(ds.aux_train.data)
            ds.aux_train.data = jax.device_put(jnp.asarray(aux_host[perm]), tsh)
            aux_row_map = None

        def train_gather(data, idx, initial_step_, rollout_):
            return sharded_gather_windows(data, idx, initial_step_, rollout_, mesh)
    steps_per_epoch = max(len(train_idx) // batch_size, 1)
    total_steps = epochs * steps_per_epoch

    key = jax.random.PRNGKey(seed)
    # Eval-only and rotation runs template model init from the (small,
    # always-resident) test store: gathering from a host-side train pool
    # would device-put the entire multi-GB pool for one window.
    init_w, init_idx = (
        (train_w, train_idx)
        if if_training and _rotate is None
        else (test_w, test_idx)
    )
    x0, y0 = gather_windows(init_w.data, jnp.asarray(init_idx[:1]), initial_step, rollout_test)
    g0 = _broadcast_grid(init_w.grid, 1)
    if if_aux:
        params = model.init(key, x0, g0, x0, g0)["params"]
        tx = make_grouped_optimizer(
            aux_group_of,
            {
                "shared": learning_rate_share,
                "primary_head": learning_rate_fc2,
                "aux_head": learning_rate_fc2,
            },
            total_steps, scheduler, 1e-4, scheduler_step, scheduler_gamma,
        )
        # aux store kept at a different (cheaper) resolution: either
        # upsample the gathered windows to the primary grid inside the
        # step, or run the aux stream at native res (aux_native_compute)
        aux_spatial = tuple(ds.aux_train.data.shape[2:-1])
        prim_spatial = tuple(train_w.data.shape[2:-1])
        aux_resize_to = aux_native_grid = None
        if aux_spatial != prim_spatial:
            if aux_native_compute:
                aux_native_grid = jax.image.resize(
                    train_w.grid, (*aux_spatial, train_w.grid.shape[-1]),
                    method="linear",
                )
            else:
                aux_resize_to = prim_spatial
        step_fn, val_fn = build_aux_step(
            model, tx, initial_step, rollout_test, num_aux_samples, auxiliary_weight,
            aux_row_map=aux_row_map, train_gather=train_gather,
            aux_chunks=aux_chunks, aux_resize_to=aux_resize_to,
            aux_native_grid=aux_native_grid,
        )
    else:
        params = model.init(key, x0, g0)["params"]
        tx = make_optimizer(
            learning_rate, total_steps, scheduler, 1e-4, scheduler_step, scheduler_gamma
        )
        step_fn, val_fn = build_baseline_step(
            model, tx, initial_step, rollout_test, training_type, t_train,
            lie_augment=lie_augment, train_gather=train_gather,
        )

    # ---- fused-Pallas fast path (train/fast_step.py) --------------------
    # The whole model fwd/bwd runs inside VMEM and the optimizer is ~12
    # ops on one flat parameter vector — identical training dynamics
    # (tests/test_fast_step.py), far fewer/larger ops.  Only the plain 2D
    # baseline single-step configuration is fused; every other path keeps
    # the XLA step.  Checkpoints store the flax tree, so eval/rollout and
    # cross-mode restores keep working (only the optimizer moments are
    # mode-specific).
    if _fast_requested and fast_step and is_3d:
        raise ValueError("fast_step=True supports only the 2D FNO (3D store)")
    use_fast = _fast_requested and if_training and not is_3d
    _tree_template = params
    if use_fast:
        from sciml_pde_tpu.train import fast_step as _fs

        theta0, _fspec = _fs.fast_state_from_tree(params, modes)
        _fstep, _ = _fs.build_fast_baseline_step(
            modes, initial_step, _fspec, learning_rate, total_steps
        )

        def step_fn(theta, fopt, data, grid, idx, key):  # noqa: ARG001 - key
            grid2 = jnp.transpose(grid, (2, 0, 1))
            return _fstep(theta, fopt, data, grid2, idx)

        @jax.jit
        def val_fn(theta, data, grid, idx):
            p = _fs.unflatten_params(theta, _fspec)
            grid2 = jnp.transpose(grid, (2, 0, 1))
            x, y = _fs.fast_gather(data, idx, initial_step)
            from sciml_pde_tpu.ops.fno_fused_step import fno2d_fused_apply

            pred = fno2d_fused_apply(x, grid2, p, modes, modes)
            return _fs.nrmse_loss_cf(pred, y)

        params = theta0
        opt_state = _fs.init_opt(theta0)
    else:
        opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    def _save_ckpt(path, p, o, ep, val):
        if use_fast:
            p = _fs.tree_from_fast_state(p, _fspec, modes, _tree_template)
        save_checkpoint(path, p, o, ep, val)

    ckpt_path = Path(run_dir) / f"{model_name}_ckpt"

    if not if_training:
        # eval path (reference fno/train.py:136-163): restore best ckpt, run
        # the rollout metric suite, pickle the six errors.
        import pickle

        from sciml_pde_tpu.eval.rollout import evaluate_rollout

        restored = restore_checkpoint(
            ckpt_path, {"params": params, "opt_state": opt_state,
                        "meta": {"epoch": np.asarray(0), "loss": np.asarray(0.0)}}
        )
        params = replicate(restored["params"], mesh)

        if if_aux:
            def apply_fn(p, x, g):
                out_p, _ = model.apply({"params": p}, x, g, x, g)
                return out_p
        else:
            def apply_fn(p, x, g):
                return model.apply({"params": p}, x, g)

        errs = evaluate_rollout(
            apply_fn, test_w, rollout_test=rollout_test, batch_size=batch_size,
            iLow=iLow, iHigh=iHigh, params=params,
        )
        # pickle the six-metric tuple (reference fno/train.py:160-162); the
        # per-step mse_time goes to its own npz (metrics.py:520-525)
        six = tuple(errs[k] for k in ["RMSE", "nRMSE", "CSV", "Max", "BD", "F"])
        with (Path(run_dir) / f"{model_name}.pickle").open("wb") as pb:
            pickle.dump(six, pb)
        np.savez(
            Path(run_dir) / f"{model_name}_mse_time.npz",
            t=np.arange(initial_step, initial_step + rollout_test),
            mse=np.asarray(errs["mse_time"]),
        )
        if plot:
            # prediction/target field render of the first test window
            # (reference metrics.py:461-508)
            from sciml_pde_tpu.eval.rollout import rollout_predict
            from sciml_pde_tpu.plots.figures import field_panels

            idx0 = jnp.asarray(test_w.window_index()[:1])
            x0p, y0p = gather_windows(test_w.data, idx0, initial_step, rollout_test)
            g0p = _broadcast_grid(test_w.grid, 1)
            preds = rollout_predict(lambda a, b: apply_fn(params, a, b), x0p, g0p, rollout_test)
            field_panels(
                Path(run_dir) / f"{model_name}_pred.png",
                np.asarray(preds[0, ..., -1, :]),
                np.asarray(y0p[0, ..., -1, :]),
                channel=channel_plot,
                title=model_name,
            )
        return FNOTrainResult(params=params, best_val=errs["nRMSE"], history=[errs])

    best_val = float(np.inf)
    start_epoch = 0
    if continue_training and ckpt_path.exists():
        # checkpoints always hold the flax PARAM TREE (so eval and
        # cross-tooling keep working); in fast mode re-pack it into the
        # flat vector.  The optimizer moments are mode-specific: a resume
        # must use the same fast_step setting the run started with.
        restored = restore_checkpoint(
            ckpt_path,
            {"params": _tree_template if use_fast else params,
             "opt_state": opt_state,
             "meta": {"epoch": np.asarray(0), "loss": np.asarray(0.0)}}
        )
        if use_fast:
            theta_r, _ = _fs.fast_state_from_tree(restored["params"], modes)
            params = replicate(theta_r, mesh)
        else:
            params = replicate(restored["params"], mesh)
        opt_state = replicate(restored["opt_state"], mesh)
        start_epoch = int(restored["meta"]["epoch"])
        best_val = float(restored["meta"]["loss"])

    # Throughput note (PERFORMANCE.md): the jitted step runs in ~0.2 ms but
    # any per-step host work serializes dispatch (jnp.asarray of the batch
    # costs ~0.6 ms, eager device-array slicing ~12 ms, and on this backend
    # a lax.scan over steps is ~13x slower than back-to-back dispatch).
    # The fast shape is: stage the WHOLE epoch's index batches to device up
    # front, then dispatch steps with zero host work between them.
    b_div = batch_size % mesh.shape["data"] == 0
    idx_sharding = (
        NamedSharding(mesh, P("data")) if b_div else replicated_sharding(mesh)
    )

    if shard_store:
        from sciml_pde_tpu.data.windows import sharded_epoch_batches

        def make_batches():
            return sharded_epoch_batches(
                train_idx, batch_size, train_w.num_trajectories, n_shards, rng
            )
    else:
        def make_batches():
            return epoch_batches(train_idx, batch_size, rng)

    stream_loader = None
    if host_stream:
        from sciml_pde_tpu.data.stream import AuxHostWindowLoader, HostWindowLoader

        if if_aux:
            stream_loader = AuxHostWindowLoader(
                train_w.data, ds.aux_train.data, train_idx, initial_step,
                rollout_test, batch_size, num_aux_samples, row_map=aux_row_map,
                seed=seed,
            )
        else:
            stream_loader = HostWindowLoader(
                train_w.data, train_idx, initial_step, rollout_test,
                batch_size, seed=seed,
            )

    history: list[dict] = []
    gstep = 0
    best_state = None
    ckpt_dirty = False
    last_ckpt_t = 0.0
    ckpt_min_interval_s = 60.0
    # epoch -> resident-slice schedule.  "cyclic" (ep % R) swaps every
    # epoch — R-1 swaps per pass — which this backend cannot afford: the
    # tunnel client RETAINS the staging buffers of every device_put (the
    # host-stream leak, PERFORMANCE.md), so each multi-GB swap leaks
    # ~1.6x its payload of host RSS and a 40-epoch run OOMs the host
    # (observed: 130 GB RSS, OOM-killed at swap ~13).  "block" gives each
    # slice one contiguous ceil(epochs/R) segment — R-1 swaps per RUN —
    # bounding the leak to R-1 payloads.  Data-order: block is a
    # sequential curriculum over slices; equivalent for identical slices
    # (the equivalence oracle) and for long runs where every slice still
    # gets the same epoch count — but under a DECAYING LR each block
    # slice sees only one LR band (the ADVICE r3 confound), which
    # "interleave" fixes at 2R-1 swaps per run: two half-run passes over
    # the slices, so every slice trains once in the high-LR half and
    # once in the low-LR half.
    def _slice_for(ep: int) -> int:
        R = resident_rotate
        if resident_rotate_schedule == "cyclic":
            return ep % R
        if resident_rotate_schedule == "interleave":
            half = max(epochs // 2, 1)
            ep_h, span = (ep, half) if ep < half else (ep - half, max(epochs - half, 1))
            return min((ep_h * R) // span, R - 1)
        return min((ep * R) // max(epochs, 1), R - 1)

    for ep in range(start_epoch, epochs):
        if _rotate is not None and _slice_for(ep) != _rot_current:
            # all prior dispatches read the old slice: params is the last
            # async output chained on them, so readiness of params implies
            # the old buffers are safe to free
            jax.block_until_ready(params)
            k = _slice_for(ep)
            # first load of the run (_rot_current None): train_w.data is
            # still the host pool — nothing on device to free
            loaded = _rot_current is not None
            train_w.data, _new_aux = _rotate(
                k, old_p=train_w.data if loaded else None,
                old_a=ds.aux_train.data if (if_aux and loaded) else None,
            )
            if if_aux:
                ds.aux_train.data = _new_aux
            _rot_current = k
        # per-step RNG only matters for on-device Lie augmentation; a
        # per-epoch key keeps the hot loop free of host-side fold_ins
        ep_key = jax.random.fold_in(key, ep)
        # accumulate the epoch loss with eager adds (each ~0.1 ms dispatch,
        # fully pipelined) — never jnp.stack a list of per-step scalars: a
        # many-operand concatenate takes minutes to compile on this backend
        loss_acc = None
        nb = 0
        if host_stream:
            # Bounded in-flight window: without it, every staged batch in
            # the epoch holds its host transfer buffer until the async
            # dispatch queue drains — a 256^2x1000-frame aux epoch staged
            # ~130 GB and got OOM-killed.  Blocking on the loss from
            # _STREAM_PIPELINE steps back caps host-pinned batches.
            from collections import deque

            inflight: deque = deque()
            for batch in stream_loader:
                batch = shard_batch(batch, mesh)
                if if_aux:
                    x, y, xa, ya = batch
                    params, opt_state, (loss, lp, la), g_norm = step_fn.xy(
                        params, opt_state, x, y, xa, ya, train_w.grid
                    )
                else:
                    x, y = batch
                    params, opt_state, loss, g_norm = step_fn.xy(
                        params, opt_state, x, y, train_w.grid, ep_key
                    )
                loss_acc = loss if loss_acc is None else loss_acc + loss
                nb += 1
                inflight.append(loss)
                if len(inflight) > _STREAM_PIPELINE:
                    jax.block_until_ready(inflight.popleft())
        elif if_aux:
            dev_batches = [jax.device_put(b, idx_sharding) for b in make_batches()]
            for bidx in dev_batches:
                params, opt_state, (loss, lp, la), g_norm = step_fn(
                    params, opt_state, train_w.data, ds.aux_train.data,
                    train_w.grid, bidx,
                )
                loss_acc = loss if loss_acc is None else loss_acc + loss
            nb = len(dev_batches)
        else:
            dev_batches = [jax.device_put(b, idx_sharding) for b in make_batches()]
            for bidx in dev_batches:
                params, opt_state, loss, g_norm = step_fn(
                    params, opt_state, train_w.data, train_w.grid, bidx, ep_key,
                )
                loss_acc = loss if loss_acc is None else loss_acc + loss
            nb = len(dev_batches)
        gstep += nb
        if log_every and (gstep // log_every) != ((gstep - nb) // log_every):
            logger.log(gstep, train_loss=float(loss), grad_norm=float(g_norm), epoch=ep)
        train_loss_sum = float(loss_acc) if loss_acc is not None else 0.0

        if ep % model_update == 0:
            val_sum = 0.0
            vb = 0
            for b in range(0, len(test_idx), batch_size):
                chunk = test_idx[b : b + batch_size]
                v = val_fn(params, test_w.data, test_w.grid, jnp.asarray(chunk))
                val_sum += float(v)
                vb += 1
            val_loss = val_sum / max(vb, 1)
            history.append(
                {"epoch": ep, "train_loss": train_loss_sum / max(nb, 1), "val_loss": val_loss}
            )
            logger.log(gstep, epoch=ep, val_loss=val_loss)
            if val_loss < best_val:
                # best-val snapshot stays ON DEVICE (a D2D copy is ~ms);
                # the orbax disk write costs seconds, so it is throttled
                # and always flushed once after the last epoch — same
                # best-val semantics as the reference (fno/train.py:319-329)
                best_val = val_loss
                best_state = (
                    jax.tree_util.tree_map(jnp.copy, params),
                    jax.tree_util.tree_map(jnp.copy, opt_state),
                    ep,
                )
                if time.time() - last_ckpt_t > ckpt_min_interval_s:
                    _save_ckpt(ckpt_path, best_state[0], best_state[1], ep, best_val)
                    last_ckpt_t = time.time()
                    ckpt_dirty = False
                else:
                    ckpt_dirty = True

    if ckpt_dirty and best_state is not None:
        _save_ckpt(ckpt_path, best_state[0], best_state[1], best_state[2], best_val)
    if use_fast:
        # hand callers the flax tree (rollout/eval drive model.apply)
        params = _fs.tree_from_fast_state(params, _fspec, modes, _tree_template)
    return FNOTrainResult(params=params, best_val=best_val, history=history)
