"""VideoMAE operator tests: shapes, invariants, aux heads, SSL path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.models.transformer import (
    VideoMAEOperator,
    VideoMAEOperatorAux,
    patchify,
    unpatchify,
    sinusoid_table,
)

pytestmark = pytest.mark.slow

SMALL = dict(
    img_size=32, patch_size=8, tubelet_size=2, in_chans=3, num_frames=4,
    encoder_dim=32, encoder_depth=2, encoder_heads=4,
    decoder_dim=16, decoder_depth=1, decoder_heads=2,
)


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32))
    tok = patchify(x, 2, 8)
    assert tok.shape == (2, 2 * 2 * 2, 2 * 8 * 8 * 3)
    back = unpatchify(tok, 2, 8, 4, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_sinusoid_table_values():
    t = sinusoid_table(4, 6)
    assert t.shape == (4, 6)
    np.testing.assert_allclose(t[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(t[0, 1::2], 1.0, atol=1e-7)  # cos(0)


def test_baseline_forward_shape_and_scale_equivariance():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32))
    model = VideoMAEOperator(**SMALL)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 32, 32, 3)
    y2 = model.apply({"params": params}, 2.0 * x)
    np.testing.assert_allclose(np.asarray(2.0 * y), np.asarray(y2), rtol=2e-3, atol=1e-4)


def test_remat_flag_same_output():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)).astype(np.float32))
    m1 = VideoMAEOperator(**SMALL, use_checkpoint=False)
    m2 = VideoMAEOperator(**SMALL, use_checkpoint=True)
    p = m1.init(jax.random.PRNGKey(3), x)["params"]
    y1 = m1.apply({"params": p}, x)
    y2 = m2.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_aux_two_streams():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32))
    xa = jnp.asarray(rng.normal(size=(4, 4, 32, 32, 3)).astype(np.float32))
    model = VideoMAEOperatorAux(**SMALL)
    params = model.init(jax.random.PRNGKey(5), x, xa)["params"]
    out_p, out_a = model.apply({"params": params}, x, xa)
    assert out_p.shape == (2, 32, 32, 3)
    assert out_a.shape == (4, 32, 32, 3)

    # identical head weights + identical inputs -> identical outputs
    params2 = dict(params)
    params2["head_auxiliary"] = jax.tree_util.tree_map(np.copy, params["head_primary"])
    p3, a3 = model.apply({"params": params2}, xa[:2], xa)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(a3[:2]), atol=1e-5)


def test_ssl_masked_path():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32))
    model = VideoMAEOperator(**SMALL, ssl=True)
    n_tokens = (4 // 2) * (32 // 8) ** 2
    n_masked = 6
    mask = np.zeros((2, n_tokens), bool)
    mask[:, -n_masked:] = True  # same count per sample (static shapes)
    params = model.init(jax.random.PRNGKey(7), x, jnp.asarray(mask))["params"]
    out = model.apply({"params": params}, x, jnp.asarray(mask))
    assert out.shape == (2, n_masked, 2 * 8 * 8 * 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dropout_path_runs_in_training_mode():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)).astype(np.float32))
    model = VideoMAEOperator(**SMALL, drop_path_rate=0.2)
    params = model.init(jax.random.PRNGKey(9), x)["params"]
    y = model.apply(
        {"params": params}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(10)},
    )
    assert np.isfinite(np.asarray(y)).all()
