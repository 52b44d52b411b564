"""Shared model building blocks."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear/Conv default kernel init: U(-k, k), k=1/sqrt(fan_in).

    flax Dense kernels are (fan_in, fan_out).
    """
    k = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        k = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


class TorchDense(nn.Module):
    """Dense layer with PyTorch-default initialization.

    Used where training-dynamics parity with the reference matters (FNO lift/
    project layers, 1x1 convs — a 1x1 conv over channels-last data *is* a
    Dense over the channel axis).
    """

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


def instance_norm_stats(x: jnp.ndarray, dims: tuple[int, ...]):
    """Per-sample, per-channel std/mean with stop-gradient.

    Matches the reference FNO normalization (fno.py:139-143): unbiased std
    (ddof=1) over ``dims`` under ``no_grad``, epsilon 1e-7 added to std.
    """
    mean = jnp.mean(x, axis=dims, keepdims=True)
    std = jnp.std(x, axis=dims, keepdims=True, ddof=1) + 1e-7
    return jax.lax.stop_gradient(std), jax.lax.stop_gradient(mean)


def gelu(x):
    """Exact (erf) GELU — torch ``F.gelu`` default, NOT the tanh approximation
    that is jax.nn.gelu's default."""
    return jax.nn.gelu(x, approximate=False)
