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

import pytest

pytestmark = pytest.mark.slow


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


def test_hyena_rejects_sequences_beyond_l_max():
    """Token counts above l_max must fail loudly at trace time (the
    residual shapes would silently mismatch otherwise) — callers size
    l_max to the flattened grid (oformer_dr2d.run_comparison_training)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 48, 8)).astype(np.float32))
    op = HyenaOperator(d_model=8, l_max=32, filter_order=8)
    with pytest.raises(ValueError, match="l_max"):
        op.init(jax.random.PRNGKey(0), x)


def test_hyena_hybrid_plumbs_l_max():
    """l_max on the hybrid reaches the operator: a grid larger than the
    4096 default-sized filter works when l_max covers it."""
    rng = np.random.default_rng(6)
    b, n, cin = 1, 40, 4
    xg = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(size=(b, n, 2)).astype(np.float32))
    hyb = HyenaOFormer2D(
        input_channels=cin, out_channels=1, in_emb_dim=8, latent_channels=8,
        heads=2, depth=2, branches=1, l_max=n,
    )
    p = hyb.init(jax.random.PRNGKey(3), xg, pos)["params"]
    u = hyb.apply({"params": p}, xg, pos)
    assert u.shape == (b, n, 1)
    assert np.isfinite(np.asarray(u)).all()


class TestPointsetBVP:
    """Irregular point-set BVP path (BVP/airfoil class): pad-masked
    Galerkin attention, two-head decode, masked loss."""

    def test_mask_invariance(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from sciml_pde_tpu.comparisons.pointset_bvp import synthetic_electrostatics
        from sciml_pde_tpu.models.oformer import OFormerIrreg2D

        d = synthetic_electrostatics(0, 2, max_points=24, min_points=16)
        model = OFormerIrreg2D(input_channels=d["features"].shape[-1],
                               latent_channels=16, depth=2)
        args = (jnp.asarray(d["features"]), jnp.asarray(d["coords"]),
                jnp.asarray(d["pad_mask"]), jnp.asarray(d["bound_mask"]))
        params = model.init(jax.random.PRNGKey(0), *args)["params"]
        s1, f1 = model.apply({"params": params}, *args)
        # scribble garbage into the padded rows: outputs must not change
        feats = np.array(d["features"])
        feats[~d["pad_mask"]] = 1e3
        coords = np.array(d["coords"])
        coords[~d["pad_mask"]] = -7.0
        s2, f2 = model.apply({"params": params}, jnp.asarray(feats),
                             jnp.asarray(coords), args[2], args[3])
        valid = d["pad_mask"]
        np.testing.assert_allclose(np.asarray(s1)[valid], np.asarray(s2)[valid],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1)[valid], np.asarray(f2)[valid],
                                   rtol=1e-4, atol=1e-5)
        # padded outputs are exactly zero
        np.testing.assert_array_equal(np.asarray(s1)[~valid], 0.0)

    def test_training_learns(self, tmp_path):
        import numpy as np
        from sciml_pde_tpu.comparisons.pointset_bvp import (
            evaluate_pointset, run_pointset_training, synthetic_electrostatics,
        )
        from sciml_pde_tpu.models.oformer import OFormerIrreg2D

        train = synthetic_electrostatics(0, 48, max_points=32, min_points=24)
        test = synthetic_electrostatics(1, 8, max_points=32, min_points=24)
        res = run_pointset_training(
            train, latent_channels=24, depth=2, batch_size=8, epochs=6,
            run_dir=str(tmp_path), log_every=1000,
        )
        assert res.history[-1]["loss"] < res.history[0]["loss"] * 0.8
        model = OFormerIrreg2D(input_channels=train["features"].shape[-1],
                               latent_channels=24, depth=2)
        m = evaluate_pointset(model, res.params, test)
        assert np.isfinite(m["scalar_l1"]) and np.isfinite(m["field_l1"])

    def test_airfoil_st_training_learns(self, tmp_path):
        from sciml_pde_tpu.comparisons.pointset_bvp import (
            run_airfoil_training, synthetic_vortex_sheet,
        )

        data = synthetic_vortex_sheet(0, 4, n_points=32, n_frames=8)
        res = run_airfoil_training(
            data, time_window=4, forward_steps=2, emb_dim=32,
            latent_channels=32, depth=2, batch_size=4, epochs=5,
            run_dir=str(tmp_path), log_every=1000,
        )
        assert res.history[-1]["l1"] < res.history[0]["l1"] * 0.9
