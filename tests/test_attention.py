"""Pallas fused attention vs jnp reference: values and gradients.

On CPU the kernel runs in interpreter mode; the same code compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.ops.attention import flash_attention, jnp_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_forward_matches_reference():
    b, h, n, d = 2, 3, 64, 16
    q, k, v = _rand((b, h, n, d), 0), _rand((b, h, n, d), 1), _rand((b, h, n, d), 2)
    scale = d**-0.5
    out = flash_attention(q, k, v, scale)
    ref = jnp_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_reference():
    b, h, n, d = 1, 2, 32, 8
    q, k, v = _rand((b, h, n, d), 3), _rand((b, h, n, d), 4), _rand((b, h, n, d), 5)
    scale = d**-0.5

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jnp_attention(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_fallback_on_odd_shapes():
    # N not multiple of 8 -> jnp fallback, still correct
    b, h, n, d = 1, 1, 17, 8
    q, k, v = _rand((b, h, n, d), 6), _rand((b, h, n, d), 7), _rand((b, h, n, d), 8)
    out = flash_attention(q, k, v, d**-0.5)
    ref = jnp_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
