"""Fused FNO layer as one Pallas kernel (round-4 perf track, v1).

SUPERSEDED by ``ops/fno_fused_step.py`` (round 4): the whole-model fused
forward+backward with a hand-derived VJP, channels-first layout, and the
SCIML_DFT_PRECISION knob threaded into the dot inputs (the ADVICE r3
finding against this file — v1 is exact-f32 ONLY and its backward
re-runs the XLA chain).  v1 is kept as the layer-granular reference
kernel with its value/grad tests; new work should target the fused-step
module.

Motivation (PERFORMANCE.md round-3 honest profile): one dft2 spectral
conv costs 69.6 us and the adjacent 1x1conv+gelu 19.0 us at the flagship
shape, while the pure padded-matmul content is ~5-25 us — the difference
is inter-op HBM round-trips and layout transitions between the five
dot_generals.  This kernel executes the whole layer

    y = gelu(spectral_conv2d(x) + x @ pw + bias)

per batch element entirely in VMEM (grid over B; a 130x130x20 slice plus
all intermediates is ~6 MB of the ~16 MB VMEM), removing every
intermediate HBM trip.  v1 keeps the contraction chain as einsums (Mosaic
lowers them to MXU dot_generals); v2 will hand-tile the chain.

Differentiation: ``fused_fno_layer_2d`` wraps the kernel in a
``jax.custom_vjp`` whose backward runs the XLA reference chain's VJP —
the forward (rollout/eval hot path) gets the fused kernel, training
correctness is inherited from the reference implementation.

Validated against the reference composition in
``tests/test_spectral_fused.py`` (values and gradients); runs in
interpreter mode off-TPU like ops/attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sciml_pde_tpu.ops.spectral import (
    _dft2_corner_axis,
    _dft2_real_axis,
    _weight_block,
    spectral_conv_2d,
)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _layer_reference(x, w1, w2, pw, bias, modes1, modes2):
    """XLA composition the kernel must match (and whose VJP backs training)."""
    y = spectral_conv_2d(x, w1, w2, modes1, modes2) + jnp.einsum(
        "bhwc,co->bhwo", x, pw
    ) + bias
    return jax.nn.gelu(y, approximate=False)


def _kernel(x_ref, fw_ref, gh_ref, w2b_ref, gi_ref, vw_ref, pw_ref, b_ref, o_ref):
    """One batch element: x (1, H, W, Ci) block -> out (1, H, W, Co), in VMEM."""
    f32 = jnp.float32
    x = x_ref[0]
    # dft2 chain (ops/spectral.py spectral_conv_2d impl="dft2"), batch-free
    xw = jnp.einsum("hwc,wsk->hskc", x, fw_ref[:], preferred_element_type=f32)
    xf = jnp.einsum("hskc,shtr->trkc", xw, gh_ref[:], preferred_element_type=f32)
    yf = jnp.einsum("trkc,tcuork->urko", xf, w2b_ref[:], preferred_element_type=f32)
    yh = jnp.einsum("urko,urvh->vhko", yf, gi_ref[:], preferred_element_type=f32)
    spec = jnp.einsum("vhko,vkw->hwo", yh, vw_ref[:], preferred_element_type=f32)
    point = jnp.einsum("hwc,co->hwo", x, pw_ref[:], preferred_element_type=f32)
    o_ref[0] = jax.nn.gelu(spec + point + b_ref[:], approximate=False)


def _fused_forward(x, w1, w2, pw, bias, modes1, modes2):
    b, h, w, _ = x.shape
    co = pw.shape[1]
    fw, vw = (jnp.asarray(a) for a in _dft2_real_axis(w, modes2))
    gh, gi = (jnp.asarray(a) for a in _dft2_corner_axis(h, modes1))
    w2b = _weight_block(
        jnp.concatenate([w1[0], w2[0]], axis=2),
        jnp.concatenate([w1[1], w2[1]], axis=2),
    )
    grid = (b,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, x.shape[-1]), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(fw.shape, lambda i: (0,) * fw.ndim, memory_space=pltpu.VMEM),
            pl.BlockSpec(gh.shape, lambda i: (0,) * gh.ndim, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2b.shape, lambda i: (0,) * w2b.ndim, memory_space=pltpu.VMEM),
            pl.BlockSpec(gi.shape, lambda i: (0,) * gi.ndim, memory_space=pltpu.VMEM),
            pl.BlockSpec(vw.shape, lambda i: (0,) * vw.ndim, memory_space=pltpu.VMEM),
            pl.BlockSpec(pw.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i: (0,) * bias.ndim,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), jnp.float32),
        interpret=_use_interpret(),
    )(x, fw, gh, w2b, gi, vw, pw, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_fno_layer_2d(x, w1, w2, pw, bias, modes1, modes2):
    """gelu(spectral_conv2d(x, w1, w2) + x @ pw + bias), fused on TPU.

    x: (B, H, W, Ci); w1/w2: (2, Ci, Co, m1, m2); pw: (Ci, Co); bias: (Co,).
    """
    return _fused_forward(x, w1, w2, pw, bias, modes1, modes2)


def _fwd(x, w1, w2, pw, bias, modes1, modes2):
    return _fused_forward(x, w1, w2, pw, bias, modes1, modes2), (x, w1, w2, pw, bias)


def _bwd(modes1, modes2, res, g):
    x, w1, w2, pw, bias = res
    _, vjp = jax.vjp(
        lambda x, w1, w2, pw, bias: _layer_reference(
            x, w1, w2, pw, bias, modes1, modes2
        ),
        x, w1, w2, pw, bias,
    )
    return vjp(g)


fused_fno_layer_2d.defvjp(_fwd, _bwd)
