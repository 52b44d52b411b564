"""OFormer + Hyena comparison models: shapes, fftconv oracle, rollout."""

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.models.oformer import (
    OFormer2D,
    apply_rotary_pos_emb,
    rotary_freqs,
    _instance_norm,
)
from sciml_pde_tpu.models.hyena import HyenaOperator, HyenaOFormer2D, fftconv


def test_fftconv_matches_direct_convolution():
    rng = np.random.default_rng(0)
    b, d, l = 2, 3, 16
    u = jnp.asarray(rng.normal(size=(b, d, l)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(d, l)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    got = np.asarray(fftconv(u, k, bias))
    # direct causal convolution oracle
    want = np.zeros((b, d, l), np.float32)
    un, kn = np.asarray(u), np.asarray(k)
    for i in range(l):
        for j in range(i + 1):
            want[:, :, i] += un[:, :, j] * kn[:, i - j]
    want += un * np.asarray(bias)[None, :, None]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_rotary_norm_preserving():
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(1, 2, 8, 16)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(size=(1, 8)).astype(np.float32))
    f = rotary_freqs(pos, 16)[:, None]
    out = apply_rotary_pos_emb(t, f)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(t), axis=-1),
        rtol=1e-4,
    )


def test_instance_norm_standardizes():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 3, 5, 32)).astype(np.float32) * 4 + 7)
    out = np.asarray(_instance_norm(x))
    np.testing.assert_allclose(out.mean(-1), 0, atol=1e-4)
    np.testing.assert_allclose(out.std(-1), 1, atol=1e-2)


def test_oformer_forward_and_rollout():
    rng = np.random.default_rng(3)
    b, n, cin, cout = 2, 64, 12, 2
    x = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(size=(b, n, 2)).astype(np.float32))
    model = OFormer2D(
        input_channels=cin, out_channels=cout, in_emb_dim=32,
        latent_channels=32, heads=2, depth=3, out_steps=1, propagator_depth=1,
    )
    params = model.init(jax.random.PRNGKey(0), x, pos)["params"]
    u = model.apply({"params": params}, x, pos)
    assert u.shape == (b, n, cout)

    roll = model.apply({"params": params}, x, pos, 4, method=OFormer2D.rollout)
    assert roll.shape == (b, n, 4 * cout)
    assert np.isfinite(np.asarray(roll)).all()


def test_hyena_operator_and_hybrid():
    rng = np.random.default_rng(4)
    b, l, d = 1, 32, 16
    x = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    op = HyenaOperator(d_model=d, l_max=64, filter_order=8)
    params = op.init(jax.random.PRNGKey(1), x)["params"]
    y = op.apply({"params": params}, x)
    assert y.shape == (b, l, d)

    n, cin = 16, 6
    xg = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(size=(b, n, 2)).astype(np.float32))
    hyb = HyenaOFormer2D(
        input_channels=cin, out_channels=1, in_emb_dim=16, latent_channels=16,
        heads=2, depth=2, branches=2,
    )
    p = hyb.init(jax.random.PRNGKey(2), xg, pos)["params"]
    u = hyb.apply({"params": p}, xg, pos)
    assert u.shape == (b, n, 1)
    assert np.isfinite(np.asarray(u)).all()
