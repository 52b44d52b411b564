"""Fused softmax attention as Pallas TPU kernels (with custom VJP).

The reference transformer's hottest op is vanilla O(N^2) softmax attention
over <=1280 tokens (``Transformer_2D_NS/Ours/transformer.py:148-168``).

Design (flash-attention, sized for this regime):
  - forward: grid (batch*heads, q_blocks); each instance holds its Q block
    plus the full K/V panels in VMEM (N<=2048 * d<=128 fits easily), fuses
    QK^T -> softmax -> PV and also writes the row logsumexp for the
    backward;
  - backward: two blocked kernels sharing the saved logsumexp and the
    precomputed delta = rowsum(dO * O):
      * dQ over (bh, q_blocks): recomputes P for its rows;
      * dK/dV over (bh, k_blocks): recomputes P^T for its columns.
    Nothing of O(N^2) ever touches HBM.

Falls back to plain jnp einsum attention when the shape is unsuited.  On
non-TPU backends the kernels run in interpreter mode (used by the CPU test
suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PALLAS_TOKENS = 2048
BLOCK_Q = 256
BLOCK_K = 256


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def jnp_attention(q, k, v, scale):
    """Reference path: (B, H, N, D) -> (B, H, N, D), fp32 softmax."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (N, D)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = (
        jnp.dot(e / denom, v, preferred_element_type=jnp.float32)
    ).astype(o_ref.dtype)
    l_ref[0] = (m + jnp.log(denom)).astype(jnp.float32)  # (BQ, 1)


def _attention_fwd_flat(q, k, v, scale):
    bh, n, d = q.shape
    bq = min(BLOCK_Q, n)
    grid = (bh, n // bq)
    o, l = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(q, k, v)
    return o, l


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, dq_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)      # (BQ, D)
    k = k_ref[0].astype(jnp.float32)      # (N, D)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)    # (BQ, D)
    l = l_ref[0]                          # (BQ, 1)
    delta = delta_ref[0]                  # (BQ, 1)

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(s - l)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq_ref[0] = (
        jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    ).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, delta_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)      # (N, D)
    k = k_ref[0].astype(jnp.float32)      # (BK, D)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)    # (N, D)
    l = l_ref[0]                          # (N, 1)
    delta = delta_ref[0]                  # (N, 1)

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, BK)
    p = jnp.exp(s - l)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, BK)
    ds = p * (dp - delta)
    dk_ref[0] = (
        jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    ).astype(dk_ref.dtype)  # (BK, D)
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _attention_bwd_flat(q, k, v, o, l, do, scale):
    bh, n, d = q.shape
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)
    bq = min(BLOCK_Q, n)
    bk = min(BLOCK_K, n)

    blk = lambda b: pl.BlockSpec((1, b, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    pan = pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    blk1 = lambda b: pl.BlockSpec((1, b, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    pan1 = pl.BlockSpec((1, n, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        grid=(bh, n // bq),
        in_specs=[blk(bq), pan, pan, blk(bq), blk1(bq), blk1(bq)],
        out_specs=blk(bq),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=_use_interpret(),
    )(q, k, v, do, l, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        grid=(bh, n // bk),
        in_specs=[pan, blk(bk), blk(bk), pan, pan1, pan1],
        out_specs=[blk(bk), blk(bk)],
        out_shape=[jax.ShapeDtypeStruct((bh, n, d), q.dtype)] * 2,
        interpret=_use_interpret(),
    )(q, k, v, do, l, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_core(q, k, v, scale):
    o, _ = _attention_fwd_flat(q, k, v, scale)
    return o


def _flash_fwd(q, k, v, scale):
    o, l = _attention_fwd_flat(q, k, v, scale)
    return o, (q, k, v, o, l)


def _flash_bwd(scale, res, do):
    q, k, v, o, l = res
    return _attention_bwd_flat(q, k, v, o, l, do, scale)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, scale: float):
    """Fused attention on (B, H, N, D); falls back to jnp when unsuited."""
    b, h, n, d = q.shape
    good = (
        n <= MAX_PALLAS_TOKENS
        and d % 8 == 0
        and (n % BLOCK_Q == 0 or n <= BLOCK_Q)
        and n % 8 == 0
    )
    if not good:
        return jnp_attention(q, k, v, scale)
    flat = lambda t: t.reshape(b * h, n, d)
    out = _flash_core(flat(q), flat(k), flat(v), float(scale))
    return out.reshape(b, h, n, d)
