"""Masked-SSL pretraining driver, tiny e2e + pretrained reload."""

import numpy as np
import jax
import jax.numpy as jnp

from sciml_pde_tpu.data.windows import WindowedTrajectories
from sciml_pde_tpu.train.ssl_pretrain import make_tube_mask, run_ssl_pretraining

import pytest

pytestmark = pytest.mark.slow


def test_make_tube_mask_fixed_count():
    m = np.asarray(make_tube_mask(jax.random.PRNGKey(0), 4, 16, 0.75))
    assert m.shape == (4, 16)
    np.testing.assert_array_equal(m.sum(1), 12)


def test_ssl_pretrain_loss_decreases(tmp_path):
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(3, 10, 16, 16, 3)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(size=(16, 16, 2)).astype(np.float32))
    train_w = WindowedTrajectories(data, grid, initial_step=4, rollout=0, train=True)
    params, hist = run_ssl_pretraining(
        train_w,
        model_kwargs=dict(
            img_size=16, patch_size=8, tubelet_size=2, in_chans=3, num_frames=4,
            encoder_dim=32, encoder_depth=1, encoder_heads=4,
            decoder_dim=16, decoder_depth=1, decoder_heads=2,
        ),
        mask_ratio=0.5, initial_step=4, batch_size=8, epochs=3,
        run_dir=str(tmp_path), log_every=1000,
    )
    assert np.isfinite(hist[-1]["ssl_loss"])
    assert hist[-1]["ssl_loss"] < hist[0]["ssl_loss"] * 1.2
    # pretrained weights can be partially loaded into the operator model
    from sciml_pde_tpu.models.transformer import VideoMAEOperator
    from sciml_pde_tpu.utils.checkpoint import load_partial_params

    op = VideoMAEOperator(
        img_size=16, patch_size=8, tubelet_size=2, in_chans=3, num_frames=4,
        encoder_dim=32, encoder_depth=1, encoder_heads=4,
        decoder_dim=16, decoder_depth=1, decoder_heads=2,
    )
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16, 3)).astype(np.float32))
    fresh = op.init(jax.random.PRNGKey(3), x)["params"]
    merged = load_partial_params(fresh, jax.tree_util.tree_map(np.asarray, params),
                                 verbose=False)
    y = op.apply({"params": merged}, x)
    assert np.isfinite(np.asarray(y)).all()
