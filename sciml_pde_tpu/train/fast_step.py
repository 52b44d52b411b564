"""Low-op-count FNO-2D training step built on the fused Pallas kernels.

The production step (train/fno_train.py build_baseline_step) is ~100 XLA
ops; on the target backend each small op costs 10-30 us, so the op COUNT
— not FLOPs — sets the step time (PERFORMANCE.md round-3 ablation).
This step reduces the graph to:

  gather (1 fused gather + 2 transposes) -> fused model fwd/bwd
  (5 pallas_calls, ops/fno_fused_step.py) -> nrmse loss (~6 reductions)
  -> ONE flat-vector optimizer: the 10 packed parameter arrays live as a
  single f32 vector, so adaptive clip + L2-to-gradient + Adam + cosine
  LR are ~12 elementwise/reduction ops on (P,) — not ~8 ops per leaf.

Semantics are bit-for-bit the production optimizer (reference
fno/train.py:168-177,253-258): clip-norm max(5, 0.1*||g||) on the GLOBAL
norm, weight decay 1e-4 added to the gradient BEFORE the Adam moments
(torch Adam(weight_decay=...), not AdamW), Adam(b1=.9, b2=.999, eps=1e-8),
cosine decay over total steps.  Equivalence to build_baseline_step is
asserted step-for-step in tests/test_fast_step.py.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.ops.fno_fused_step import (
    FastFNOParams,
    fno2d_fused_apply,
    pack_params,
    unpack_grads,
)

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8
CLIP_FLOOR, CLIP_FRAC, WEIGHT_DECAY = 5.0, 0.1, 1e-4


def _compiler_options():
    """TPU-compiler overrides for the fused-step jits.

    The bwd megakernel's VMEM stack sits at 16.86 MB after the round-5
    shrinks — 884 KB over the TPU compiler's DEFAULT 16 MB scoped-vmem
    budget (tpu_smoke r5 verdict), while v5e has 128 MB of physical
    VMEM.  ``--xla_tpu_scoped_vmem_limit_kib`` is a compile-time budget
    knob, not a hardware limit, but it is unknown to the CPU-client XLA
    flag parser (XLA_FLAGS fatals), so it must travel as per-compile
    env_option_overrides, which serialize through the remote compile
    helper.  SCIML_SCOPED_VMEM_KIB overrides/disables (0 = off).
    """
    kib = os.environ.get("SCIML_SCOPED_VMEM_KIB", "32768")
    if not kib or kib == "0":
        return None
    if jax.default_backend() != "tpu":  # CPU XLA rejects unknown options
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


class FlatSpec(NamedTuple):
    """Static flatten/unflatten recipe for FastFNOParams."""

    shapes: tuple
    sizes: tuple
    offsets: tuple

    @property
    def total(self) -> int:
        return int(self.offsets[-1] + self.sizes[-1])


def flat_spec(p: FastFNOParams) -> FlatSpec:
    shapes = tuple(tuple(a.shape) for a in p)
    sizes = tuple(int(np.prod(s)) for s in shapes)
    offsets = tuple(int(o) for o in np.cumsum((0,) + sizes[:-1]))
    return FlatSpec(shapes, sizes, offsets)


def flatten_params(p: FastFNOParams) -> jnp.ndarray:
    return jnp.concatenate([jnp.ravel(a) for a in p])


def unflatten_params(v: jnp.ndarray, spec: FlatSpec) -> FastFNOParams:
    return FastFNOParams(*(
        jax.lax.dynamic_slice_in_dim(v, off, size).reshape(shape)
        for off, size, shape in zip(spec.offsets, spec.sizes, spec.shapes)
    ))


class FlatOptState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    count: jnp.ndarray  # int32 scalar


def init_opt(theta: jnp.ndarray) -> FlatOptState:
    return FlatOptState(
        m=jnp.zeros_like(theta), v=jnp.zeros_like(theta),
        count=jnp.zeros((), jnp.int32),
    )


def cosine_lr(base_lr: float, total_steps: int):
    def sched(count):
        frac = jnp.clip(count.astype(jnp.float32) / max(total_steps, 1), 0.0, 1.0)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
    return sched


def optimizer_update(theta, opt: FlatOptState, gflat, sched):
    """clip -> +wd*theta -> adam -> -lr: the exact production chain on one
    flat vector.  Returns (theta', opt', g_norm)."""
    g_norm = jnp.sqrt(jnp.sum(gflat * gflat))
    clip_value = jnp.maximum(CLIP_FLOOR, CLIP_FRAC * g_norm)
    g = gflat * jnp.minimum(1.0, clip_value / (g_norm + 1e-12))
    g = g + WEIGHT_DECAY * theta
    m = ADAM_B1 * opt.m + (1.0 - ADAM_B1) * g
    v = ADAM_B2 * opt.v + (1.0 - ADAM_B2) * (g * g)
    count = opt.count + 1
    cf = count.astype(jnp.float32)
    mhat = m / (1.0 - ADAM_B1 ** cf)
    vhat = v / (1.0 - ADAM_B2 ** cf)
    update = mhat / (jnp.sqrt(vhat) + ADAM_EPS)
    # the schedule is evaluated at the PRE-increment count, matching
    # optax.scale_by_learning_rate over an optax chain (its inner count
    # increments after the scale)
    theta = theta - sched(opt.count) * update
    return theta, FlatOptState(m, v, count), g_norm


def nrmse_loss_cf(pred, tar):
    """nrmse_loss (metrics.py:185) for channels-first (B, C, X, Y)."""
    residuals = pred - tar
    tar_norm = 1e-7 + jnp.mean(tar * tar, axis=(2, 3), keepdims=True)
    raw = jnp.mean(residuals * residuals, axis=(2, 3), keepdims=True) / tar_norm
    return jnp.mean(raw)


def fast_gather(data, idx, initial_step: int):
    """Window gather producing channels-first layouts.

    data (N, T, X, Y, C), idx (B, 2) -> win (B, T0, C, X, Y),
    y (B, C, X, Y) [rollout 1].
    """
    span = initial_step + 1
    offs = jnp.arange(span, dtype=idx.dtype)
    win5 = data[idx[:, 0, None], idx[:, 1, None] + offs[None, :]]
    win5 = win5.astype(jnp.float32)
    x = jnp.transpose(win5[:, :initial_step], (0, 1, 4, 2, 3))
    y = jnp.transpose(win5[:, initial_step], (0, 3, 1, 2))
    return x, y


def build_fast_baseline_step(
    modes: int,
    initial_step: int,
    spec: FlatSpec,
    learning_rate: float = 1e-3,
    total_steps: int = 10_000,
    pad: int = 2,
):
    """Returns (step, step_scan) over (theta_flat, FlatOptState).

    step(theta, opt, data, grid2, idx) -> (theta, opt, loss, g_norm)
    matches build_baseline_step's single-rollout training semantics.
    """
    sched = cosine_lr(learning_rate, total_steps)

    def loss_fn(theta, data, grid2, idx):
        p = unflatten_params(theta, spec)
        x, y = fast_gather(data, idx, initial_step)
        pred = fno2d_fused_apply(x, grid2, p, modes, modes, pad)
        return nrmse_loss_cf(pred, y)

    def _one(theta, opt, data, grid2, idx):
        loss, g = jax.value_and_grad(loss_fn)(theta, data, grid2, idx)
        theta, opt, g_norm = optimizer_update(theta, opt, g, sched)
        return theta, opt, loss, g_norm

    copts = _compiler_options()

    @functools.partial(jax.jit, donate_argnums=(0, 1), compiler_options=copts)
    def step(theta, opt, data, grid2, idx):
        return _one(theta, opt, data, grid2, idx)

    @functools.partial(jax.jit, donate_argnums=(0, 1), compiler_options=copts)
    def step_scan(theta, opt, data, grid2, idx_chunk):
        def body(carry, idx):
            theta, opt = carry
            theta, opt, loss, g_norm = _one(theta, opt, data, grid2, idx)
            return (theta, opt), (loss, g_norm)

        (theta, opt), (losses, g_norms) = jax.lax.scan(
            body, (theta, opt), idx_chunk
        )
        return theta, opt, losses, g_norms

    return step, step_scan


def fast_state_from_tree(tree, modes: int):
    """Flax param tree -> (theta_flat, FlatSpec)."""
    p = pack_params(tree, modes, modes)
    spec = flat_spec(p)
    return flatten_params(p), spec


def tree_from_fast_state(theta, spec: FlatSpec, modes: int, like_tree):
    """theta_flat -> flax param tree (checkpoint interchange)."""
    return unpack_grads(unflatten_params(theta, spec), modes, modes, like_tree)
