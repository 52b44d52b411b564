"""Hyena-suite npy converter + OFormer generic held-out eval."""

import h5py
import jax
import numpy as np

from sciml_pde_tpu.comparisons.make_npy import convert_dir, to_mag_frames

import pytest

pytestmark = pytest.mark.slow


def test_to_mag_frames_layouts():
    v = np.random.default_rng(0).normal(size=(3, 16, 16, 2)).astype(np.float32)
    out = to_mag_frames(v, size=8)
    assert out.shape == (3, 8, 8)
    # channel-first layout gives the same result
    out2 = to_mag_frames(np.moveaxis(v, -1, 0), size=8)
    np.testing.assert_allclose(out, out2, rtol=1e-6)
    # 5D (case, T, H, W, 2) flattens case*T
    v5 = v.reshape(1, 3, 16, 16, 2)
    assert to_mag_frames(v5, size=8).shape == (3, 8, 8)


def test_convert_dir(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(2):
        with h5py.File(tmp_path / f"ns_{i}.h5", "w") as f:
            f.create_dataset("velocity", data=rng.normal(size=(2, 4, 16, 16, 2)))
    out = convert_dir(tmp_path, tmp_path / "mag.npy", size=8)
    arr = np.load(out)
    assert arr.shape == (16, 8, 8)
    assert np.isfinite(arr).all()


def test_oformer_generic_eval_runs():
    from sciml_pde_tpu.comparisons.oformer_generic import (
        eval_oformer_burgers,
        eval_oformer_darcy,
        run_oformer_burgers,
        run_oformer_darcy,
    )

    rng = np.random.default_rng(2)
    data = rng.normal(size=(3, 14, 32)).astype(np.float32)
    res = run_oformer_burgers(data, initial_step=4, epochs=1, batch_size=4,
                              in_emb_dim=16, depth=2, heads=2)
    rel = eval_oformer_burgers(res.params, data, initial_step=4, batch_size=4,
                               in_emb_dim=16, depth=2, heads=2)
    assert np.isfinite(rel) and rel > 0

    a = rng.normal(size=(6, 12, 12)).astype(np.float32)
    u = rng.normal(size=(6, 12, 12)).astype(np.float32)
    res = run_oformer_darcy(a, u, epochs=1, batch_size=3,
                            in_emb_dim=16, depth=2, heads=2)
    rel = eval_oformer_darcy(res.params, a, u, batch_size=3,
                             in_emb_dim=16, depth=2, heads=2)
    assert np.isfinite(rel) and rel > 0
