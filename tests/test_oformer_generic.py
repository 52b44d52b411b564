"""Generic OFormer drivers (Burgers 1D / Darcy 2D) on synthetic data."""

import numpy as np

from sciml_pde_tpu.comparisons.oformer_generic import (
    run_oformer_burgers,
    run_oformer_darcy,
)

import pytest

pytestmark = pytest.mark.slow


def test_burgers_1d_training(tmp_path):
    rng = np.random.default_rng(0)
    # smooth decaying 1D trajectories
    x = np.linspace(0, 1, 24)
    t = np.arange(8)[:, None]
    data = np.stack(
        [np.sin(2 * np.pi * (x[None] - 0.05 * t) * (1 + i % 3)) * np.exp(-0.05 * t)
         for i in range(4)]
    ).astype(np.float32)
    res = run_oformer_burgers(
        data, initial_step=3, batch_size=4, epochs=2, in_emb_dim=16, depth=2,
        heads=2, run_dir=str(tmp_path), log_every=1000,
    )
    assert np.isfinite(res.history[-1]["rel_l2"])


def test_darcy_2d_training(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.uniform(1, 2, size=(6, 12, 12)).astype(np.float32)
    u = (a * 0.1 + rng.normal(scale=0.01, size=a.shape)).astype(np.float32)
    res = run_oformer_darcy(a, u, batch_size=3, epochs=2, in_emb_dim=16,
                            depth=2, heads=2, run_dir=str(tmp_path))
    assert np.isfinite(res.history[-1]["rel_l2"])
