"""Airfoil compressible-flow generator: solver sanity + reference protocol.

Covers sim/airfoil_2d.py: geometry, free-stream preservation of the FV
scheme, penalization, npz schema (dataset_new.py:550-640 contract), and
the loader -> point-set trainer roundtrip.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.sim.airfoil_2d import (
    AirfoilConfig,
    airfoil_mask_and_distance,
    freestream_state,
    generate_dataset,
    generate_sample,
    load_airfoil_dataset,
    make_step,
    naca4_polyline,
    place_airfoil,
    sample_nodes,
    simulate,
)

TINY = AirfoilConfig(
    nx=64, ny=64, n_frames=3, frame_dt=4.0e-4, settle_time=2.0e-3,
    sponge_width=0.8,
)


def test_naca_polyline_closed_and_sane():
    poly = naca4_polyline(0.02, 0.4, 0.12)
    assert poly.shape[1] == 2
    # nose near x=0 (cambered upper surface may curl slightly past it)
    assert abs(poly[:, 0].min()) < 5e-3 and abs(poly[:, 0].max() - 1.0) < 5e-3
    # max thickness ~ 12% chord
    assert 0.05 < poly[:, 1].max() - poly[:, 1].min() < 0.2
    inside, dist = airfoil_mask_and_distance(
        poly, np.array([[0.5, 0.0], [0.5, 0.5], [-0.2, 0.0]])
    )
    assert inside.tolist() == [True, False, False]
    assert dist[0] < 0.08 and dist[1] > 0.3


def test_aoa_rotation_rotates():
    poly = naca4_polyline(0.0, 0.4, 0.12)
    p0 = place_airfoil(poly, 0.0)
    p10 = place_airfoil(poly, 10.0)
    assert not np.allclose(p0, p10)
    # chord endpoints still ~1 apart
    for p in (p0, p10):
        d = np.linalg.norm(p.max(0) - p.min(0))
        assert 0.9 < d < 1.2


def test_freestream_preserved_without_body():
    """Uniform flow is an exact steady state of the MUSCL/Rusanov scheme."""
    cfg = TINY
    U_inf = freestream_state(cfg)
    chi = jnp.zeros((cfg.nx, cfg.ny), jnp.float32)
    sponge = jnp.zeros((cfg.nx, cfg.ny), jnp.float32)
    step = make_step(cfg, chi, sponge, jnp.asarray(U_inf))
    U = jnp.broadcast_to(
        jnp.asarray(U_inf)[:, None, None], (4, cfg.nx, cfg.ny)
    ).astype(jnp.float32)
    U5 = U
    for _ in range(5):
        U5 = step(U5)
    rel = float(jnp.max(jnp.abs(U5 - U) / (jnp.abs(U) + 1.0)))
    assert rel < 1e-5, rel


def test_simulate_stable_and_body_stagnates():
    frames, chi, grid = simulate(TINY)
    assert frames.shape == (3, 4, TINY.nx, TINY.ny)
    assert np.all(np.isfinite(frames))
    rho, u, v, p = frames[-1, 0], frames[-1, 1], frames[-1, 2], frames[-1, 3]
    assert rho.min() > 0.1 and p.min() > 1e3
    speed = np.sqrt(u**2 + v**2)
    solid = chi > 0.9
    assert solid.any()
    # penalization drives the interior of the body well below free-stream
    assert speed[solid].mean() < 0.2 * TINY.v_inf
    # flow away from the body stays near free-stream speed
    far = (~solid) & (np.abs(grid[..., 0]) > 3.0)
    assert abs(speed[far].mean() - TINY.v_inf) < 0.3 * TINY.v_inf


def test_sample_nodes_types_and_placement():
    rng = np.random.default_rng(0)
    pos, nt = sample_nodes(TINY, rng, n_interior=200, n_surface=40, n_farfield=16)
    assert set(np.unique(nt)) <= {0, 2, 4}
    assert (nt == 2).sum() == 40 and (nt == 4).sum() == 16
    poly = place_airfoil(
        naca4_polyline(TINY.camber, TINY.camber_pos, TINY.thickness),
        TINY.aoa_deg,
    )
    inside, dist = airfoil_mask_and_distance(poly, pos.astype(np.float64))
    assert not inside.any()
    # surface nodes hug the airfoil
    assert dist[nt == 2].max() < 10 * TINY.dx


def test_generate_sample_schema_matches_reference_loader():
    d = generate_sample(3, TINY)
    T = TINY.n_frames
    n = d["pos"].shape[1]
    assert d["pos"].shape == (T, n, 2)
    assert d["node_type"].shape == (T, n, 1)
    assert d["vel"].shape == (T, n, 2)
    assert d["prs"].shape == (T, n, 1)
    assert d["dns"].shape == (T, n, 1)
    assert d["cells"].ndim == 3 and d["cells"].shape[2] == 3
    # static mesh invariants the reference loader asserts (dataset_new.py:596)
    assert np.sum(d["pos"][-1] - d["pos"][0]) < 1e-5
    assert np.sum(d["node_type"][-1] - d["node_type"][0]) < 1e-5
    # aerodynamic scales
    assert 0.5 < d["dns"].mean() < 2.0
    assert 5e4 < d["prs"].mean() < 2e5


def test_dataset_roundtrip_and_training(tmp_path):
    generate_dataset(str(tmp_path), [0, 1], TINY, verbose=False)
    assert (tmp_path / "af_train_data_statistics.npz").exists()
    data = load_airfoil_dataset(str(tmp_path))
    s, t, n, c = data["fields"].shape
    assert (s, t, c) == (2, TINY.n_frames, 4)
    assert data["coords"].shape == (2, n, 2)
    assert data["coords"].min() >= 0.0 and data["coords"].max() <= 1.0
    assert set(np.unique(data["node_type"])) <= {0, 1, 2}
    # standardized fields are O(1)
    assert abs(float(data["fields"].mean())) < 1.0
    from sciml_pde_tpu.comparisons.pointset_bvp import run_airfoil_training

    res = run_airfoil_training(
        data, time_window=1, forward_steps=1, emb_dim=16, latent_channels=16,
        depth=1, batch_size=2, epochs=1, run_dir=str(tmp_path / "run"),
    )
    assert np.isfinite(res.history[-1]["l1"])
