"""Partial-DFT (MXU matmul) spectral conv == jnp.fft reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.ops.spectral import (
    spectral_conv_2d,
    spectral_conv_3d,
    spectral_weight_init,
)


@pytest.mark.parametrize("shape,modes", [((2, 18, 18, 3), (4, 4)), ((1, 16, 12, 2), (5, 3))])
def test_dft_matches_fft_2d(shape, modes):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ci, co = shape[-1], 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w1 = spectral_weight_init(k1, ci, co, *modes)
    w2 = spectral_weight_init(k2, ci, co, *modes)
    a = spectral_conv_2d(x, w1, w2, *modes, impl="fft")
    b = spectral_conv_2d(x, w1, w2, *modes, impl="dft")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dft_matches_fft_3d():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 10, 12, 2)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    ws = [spectral_weight_init(k, 2, 3, 2, 3, 2) for k in keys]
    a = spectral_conv_3d(x, *ws, 2, 3, 2, impl="fft")
    b = spectral_conv_3d(x, *ws, 2, 3, 2, impl="dft")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("shape,modes", [((2, 18, 18, 3), (4, 4)), ((1, 16, 12, 2), (5, 3))])
def test_dft2_matches_fft_2d(shape, modes):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ci, co = shape[-1], 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    w1 = spectral_weight_init(k1, ci, co, *modes)
    w2 = spectral_weight_init(k2, ci, co, *modes)
    a = spectral_conv_2d(x, w1, w2, *modes, impl="fft")
    b = spectral_conv_2d(x, w1, w2, *modes, impl="dft2")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dft2_matches_fft_3d():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 8, 10, 12, 2)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(4), 4)
    ws = [spectral_weight_init(k, 2, 3, 2, 3, 2) for k in keys]
    a = spectral_conv_3d(x, *ws, 2, 3, 2, impl="fft")
    b = spectral_conv_3d(x, *ws, 2, 3, 2, impl="dft2")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_dft2_gradients_match():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 2)).astype(np.float32))
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    w1 = spectral_weight_init(k1, 2, 2, 3, 3)
    w2 = spectral_weight_init(k2, 2, 2, 3, 3)

    def loss(impl):
        return lambda ws: jnp.sum(spectral_conv_2d(x, ws[0], ws[1], 3, 3, impl=impl) ** 2)

    ga = jax.grad(loss("fft"))((w1, w2))
    gb = jax.grad(loss("dft2"))((w1, w2))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_default_impl_switch():
    from sciml_pde_tpu.ops import spectral as S

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 10, 10, 2)).astype(np.float32))
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    w1 = spectral_weight_init(k1, 2, 2, 3, 3)
    w2 = spectral_weight_init(k2, 2, 2, 3, 3)
    ref = spectral_conv_2d(x, w1, w2, 3, 3, impl="dft")
    old = S._DEFAULT_IMPL
    try:
        S.set_spectral_impl("dft2")
        out = spectral_conv_2d(x, w1, w2, 3, 3)  # impl=None -> module default
    finally:
        S._DEFAULT_IMPL = old
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_dft_path_gradients_match():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 2)).astype(np.float32))
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    w1 = spectral_weight_init(k1, 2, 2, 3, 3)
    w2 = spectral_weight_init(k2, 2, 2, 3, 3)

    def loss(impl):
        return lambda ws: jnp.sum(spectral_conv_2d(x, ws[0], ws[1], 3, 3, impl=impl) ** 2)

    ga = jax.grad(loss("fft"))((w1, w2))
    gb = jax.grad(loss("dft"))((w1, w2))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
