"""2D BVP generator: Dirichlet Poisson solve oracle + schema checks."""

import numpy as np
import jax.numpy as jnp

from sciml_pde_tpu.sim.bvp_2d import (
    BVPConfig,
    generate_case,
    generate_dataset,
    load_pointset,
    poisson_dirichlet,
)


def test_poisson_dirichlet_inverts_laplacian():
    n = 32
    dx = 1.0 / (n + 1)
    rng = np.random.default_rng(0)
    rho = rng.normal(size=(n, n)).astype(np.float32)
    phi = np.asarray(poisson_dirichlet(jnp.asarray(rho), dx))
    # apply the 5-point Laplacian with zero Dirichlet walls
    pp = np.pad(phi, 1)
    lap = (pp[2:, 1:-1] + pp[:-2, 1:-1] + pp[1:-1, 2:] + pp[1:-1, :-2]
           - 4 * phi) / dx**2
    np.testing.assert_allclose(lap, -rho, rtol=2e-3, atol=2e-3)


def test_case_schema_and_physics():
    cfg = BVPConfig(grid=64, min_points=100, max_points=160)
    c = generate_case(3, cfg)
    x, y = c["data_x"], c["data_y"]
    assert x.shape[1] == 11 and y.shape[1] == 3
    assert 100 <= x.shape[0] <= 160
    bnd = np.abs(x[:, 3] - 1.0) < 1e-10
    # grounded boundary: potential exactly zero on the walls
    np.testing.assert_allclose(y[bnd, 0], 0.0)
    # interior potential is non-trivial
    assert np.abs(y[~bnd, 0]).max() > 0


def test_magneto_field_is_curl():
    """For the magneto kind, the field must be divergence-free-ish
    (B = curl A) — check the grid-level construction on one case by
    comparing field columns against electro's rotated gradient."""
    ce = generate_case(5, BVPConfig(kind="electro", grid=64, min_points=120, max_points=121))
    cm = generate_case(5, BVPConfig(kind="magneto", grid=64, min_points=120, max_points=121))
    # same rng stream -> same nodes/sources; B = (-Ey, Ex) rotation of E
    np.testing.assert_allclose(cm["data_y"][:, 1], -ce["data_y"][:, 2], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cm["data_y"][:, 2], ce["data_y"][:, 1], rtol=1e-5, atol=1e-6)


def test_pickle_roundtrip(tmp_path):
    cfg = BVPConfig(grid=32, min_points=50, max_points=80)
    generate_dataset(tmp_path / "electro_train.pkl", 4, cfg)
    d = load_pointset(tmp_path / "electro_train.pkl")
    assert d["features"].shape[0] == 4
    p = d["features"].shape[1]
    assert 50 <= p <= 80
    assert d["pad_mask"].any(axis=1).all()
    assert (d["scalar"][~d["pad_mask"]] == 0).all()


def test_reference_recipe_training_on_real_cases(tmp_path):
    """The BVP study path end to end at tiny scale: real generated cases,
    reference recipe (squared loss, amsgrad, onecycle, clip 2), finite
    loss, and the reference MSE test metrics present."""
    from sciml_pde_tpu.comparisons.pointset_bvp import (
        evaluate_pointset,
        run_pointset_training,
    )
    from sciml_pde_tpu.models.oformer import OFormerIrreg2D

    cfg = BVPConfig(grid=32, min_points=40, max_points=64)
    generate_dataset(tmp_path / "electro_train.pkl", 8, cfg)
    generate_dataset(tmp_path / "electro_test.pkl", 2, cfg, seed0=100)
    train = load_pointset(tmp_path / "electro_train.pkl")
    test = load_pointset(tmp_path / "electro_test.pkl")

    res = run_pointset_training(
        train, latent_channels=16, heads=1, depth=2, batch_size=4,
        epochs=2, learning_rate=3e-4, reference_recipe=True,
        run_dir=str(tmp_path), log_every=100,
    )
    assert np.isfinite(res.history[-1]["loss"])
    model = OFormerIrreg2D(input_channels=11, latent_channels=16,
                           heads=1, depth=2)
    ev = evaluate_pointset(model, res.params, test)
    for k in ("mse_potential", "mse_field", "mse_total",
              "rel_l2_potential", "rel_l2_field"):
        assert np.isfinite(ev[k]), k


def test_standardize_features_train_stats_applied_to_test(tmp_path):
    """Per-column stats come from valid TRAIN nodes only; train columns
    become ~zero-mean/unit-std over valid nodes, test uses the same
    affine map, and pad rows stay exactly zero."""
    from sciml_pde_tpu.comparisons.pointset_bvp import standardize_features

    cfg = BVPConfig(grid=32, min_points=40, max_points=64)
    generate_dataset(tmp_path / "tr.pkl", 6, cfg)
    generate_dataset(tmp_path / "te.pkl", 2, cfg, seed0=50)
    train = load_pointset(tmp_path / "tr.pkl")
    test = load_pointset(tmp_path / "te.pkl")
    raw_test = test["features"].copy()

    tr, te, (mean, std) = standardize_features(train, test)

    m = tr["pad_mask"][..., None]
    f = tr["features"]
    valid = np.broadcast_to(m, f.shape)
    col_mean = (f * m).sum((0, 1)) / m.sum((0, 1))
    assert np.allclose(col_mean, 0.0, atol=1e-4)
    # constant-ish columns may have tiny raw std; skip those for the std check
    big = std > 1e-3
    col_std = np.sqrt(((f - col_mean) ** 2 * m).sum((0, 1)) / m.sum((0, 1)))
    assert np.allclose(col_std[big], 1.0, atol=1e-3)
    # same affine map on test (valid nodes)
    vm = te["pad_mask"]
    expect = (raw_test[vm] - mean) / std
    assert np.allclose(te["features"][vm], expect, atol=1e-5)
    # pad rows inert
    assert np.all(tr["features"][~tr["pad_mask"]] == 0.0)
    assert np.all(te["features"][~vm] == 0.0)
    # inputs untouched
    assert np.array_equal(test["features"], raw_test)


def test_total_steps_budget_overrides_epochs(tmp_path):
    """total_steps stops the loop exactly at the budget."""
    from sciml_pde_tpu.comparisons.pointset_bvp import run_pointset_training

    cfg = BVPConfig(grid=32, min_points=40, max_points=64)
    generate_dataset(tmp_path / "tr.pkl", 8, cfg)
    train = load_pointset(tmp_path / "tr.pkl")
    res = run_pointset_training(
        train, latent_channels=8, heads=1, depth=1, batch_size=4,
        epochs=1, learning_rate=3e-4, run_dir=str(tmp_path),
        total_steps=3, log_every=1,
    )
    import json as _json
    rows = [
        _json.loads(l)
        for l in open(f"{tmp_path}/pointset_bvp.jsonl")
    ]
    assert rows[-1]["step"] == 3
    assert np.isfinite(res.history[-1]["loss"])
