"""Fused FNO layer kernel vs the XLA reference composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.ops.spectral_fused import _layer_reference, fused_fno_layer_2d


@pytest.fixture()
def layer_inputs():
    rng = np.random.default_rng(0)
    B, H, W, C, M = 2, 18, 18, 6, 4
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    scale = 1.0 / (C * C)
    w1 = jnp.asarray((scale * rng.normal(size=(2, C, C, M, M))).astype(np.float32))
    w2 = jnp.asarray((scale * rng.normal(size=(2, C, C, M, M))).astype(np.float32))
    pw = jnp.asarray((rng.normal(size=(C, C)) * 0.1).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(C,)) * 0.01).astype(np.float32))
    return x, w1, w2, pw, bias, M


def test_forward_matches_reference(layer_inputs):
    x, w1, w2, pw, bias, M = layer_inputs
    got = fused_fno_layer_2d(x, w1, w2, pw, bias, M, M)
    want = _layer_reference(x, w1, w2, pw, bias, M, M)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_gradients_match_reference(layer_inputs):
    x, w1, w2, pw, bias, M = layer_inputs

    def loss_fused(x, w1, w2, pw, bias):
        return jnp.sum(fused_fno_layer_2d(x, w1, w2, pw, bias, M, M) ** 2)

    def loss_ref(x, w1, w2, pw, bias):
        return jnp.sum(_layer_reference(x, w1, w2, pw, bias, M, M) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, w2, pw, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, w2, pw, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5)


def test_jit_and_vmap_shapes(layer_inputs):
    x, w1, w2, pw, bias, M = layer_inputs
    out = jax.jit(lambda *a: fused_fno_layer_2d(*a, M, M))(x, w1, w2, pw, bias)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
