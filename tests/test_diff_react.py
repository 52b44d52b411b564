"""JAX diffusion-reaction solver vs scipy solve_ivp oracle.

The oracle integrates the same FitzHugh-Nagumo FVM system with scipy RK45
(the reference's integrator, sim_diff_react.py:125-129) but built
independently: the Neumann Laplacian is an edge-padded numpy stencil rather
than the 5-diagonal sparse matrix.
"""

import numpy as np
import pytest
from scipy.integrate import solve_ivp

from sciml_pde_tpu.sim.diff_react import (
    DiffReactConfig,
    initial_condition,
    laplacian_neumann,
    simulate_diff_react,
    generate_trajectories,
    stability_substeps,
    _rhs,
)


def np_lap(u, inv_dx2, inv_dy2):
    px = np.pad(u, ((0, 0), (1, 1)), mode="edge")
    py = np.pad(u, ((1, 1), (0, 0)), mode="edge")
    return (px[:, 2:] - 2 * u + px[:, :-2]) * inv_dx2 + (
        py[2:] - 2 * u + py[:-2]
    ) * inv_dy2


def scipy_trajectory(seed, cfg):
    ic = initial_condition(seed, cfg)
    ny, nx = cfg.ydim, cfg.xdim
    inv_dx2, inv_dy2 = 1 / cfg.dx**2, 1 / cfg.dy**2

    def rhs(t, y):
        u = y[: nx * ny].reshape(ny, nx)
        v = y[nx * ny :].reshape(ny, nx)
        if cfg.sim_type == "all":
            ut = (u - u**3 - cfg.k - v) + cfg.Du * np_lap(u, inv_dx2, inv_dy2)
            vt = (u - v) + cfg.Dv * np_lap(v, inv_dx2, inv_dy2)
        elif cfg.sim_type == "react":
            ut = u - u**3 - cfg.k - v
            vt = u - v
        else:
            ut = cfg.Du * np_lap(u, inv_dx2, inv_dy2)
            vt = cfg.Dv * np_lap(v, inv_dx2, inv_dy2)
        return np.concatenate([ut.ravel(), vt.ravel()])

    y0 = np.concatenate([ic[..., 0].ravel(), ic[..., 1].ravel()]).astype(np.float64)
    sol = solve_ivp(rhs, (0, cfg.t), y0, t_eval=cfg.tgrid, rtol=1e-6, atol=1e-9)
    traj = sol.y.T.reshape(cfg.tdim, 2, ny, nx)
    return np.stack([traj[:, 0], traj[:, 1]], axis=-1)


SMALL = dict(xdim=24, ydim=24, t=2.0, tdim=9)


@pytest.mark.parametrize("sim_type", ["all", "react", "diff"])
def test_matches_scipy_rk45(sim_type):
    cfg = DiffReactConfig(sim_type=sim_type, **SMALL)
    got = np.asarray(simulate_diff_react(initial_condition(7, cfg), cfg))
    want = scipy_trajectory(7, cfg)
    scale = np.sqrt(np.mean(want**2))
    nrmse = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert nrmse < 2e-3, f"{sim_type}: nrmse={nrmse}"


def test_decomposition_rhs_consistency():
    """rhs(all) == rhs(react) + rhs(diff) pointwise (the paper's physics
    decomposition is exact at the RHS level)."""
    cfg_all = DiffReactConfig(sim_type="all", **SMALL)
    cfg_r = DiffReactConfig(sim_type="react", **SMALL)
    cfg_d = DiffReactConfig(sim_type="diff", **SMALL)
    s = np.random.default_rng(0).normal(size=(24, 24, 2)).astype(np.float32)
    f_all = np.asarray(_rhs(s, cfg_all))
    f_sum = np.asarray(_rhs(s, cfg_r)) + np.asarray(_rhs(s, cfg_d))
    np.testing.assert_allclose(f_all, f_sum, atol=1e-5)


def test_laplacian_matches_reference_matrix():
    """Stencil + edge padding equals the reference's 5-diagonal Neumann
    matrix (sim_diff_react.py:94-125), built here from scipy.sparse.diags."""
    from scipy.sparse import diags

    nx, ny, dx, dy = 6, 5, 0.3, 0.4
    main = -2 * np.ones(nx) / dx**2 - 2 * np.ones(nx) / dy**2
    main[0] = -1 / dx**2 - 2 / dy**2
    main[-1] = -1 / dx**2 - 2 / dy**2
    main = np.tile(main, ny)
    main[:nx] += 1 / dy**2
    main[nx * (ny - 1) :] += 1 / dy**2
    left = np.ones(nx); left[0] = 0
    left = np.tile(left, ny)[1:] / dx**2
    right = np.ones(nx); right[-1] = 0
    right = np.tile(right, ny)[:-1] / dx**2
    offd = np.ones(nx * (ny - 1)) / dy**2
    lap = diags([main, left, right, offd, offd], [0, -1, 1, -nx, nx]).toarray()

    u = np.random.default_rng(1).normal(size=(ny, nx))
    want = (lap @ u.ravel()).reshape(ny, nx)
    got = np.asarray(laplacian_neumann(u.astype(np.float32), 1 / dx**2, 1 / dy**2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_generate_trajectories_batch_shape_and_determinism():
    cfg = DiffReactConfig(sim_type="react", xdim=8, ydim=8, t=1.0, tdim=5)
    a = generate_trajectories([0, 1], cfg)
    b = generate_trajectories([0, 1], cfg)
    assert a.shape == (2, 5, 8, 8, 2)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a[0], a[1])


def test_stability_substeps_scaling():
    lo = stability_substeps(DiffReactConfig(xdim=32, ydim=32))
    hi = stability_substeps(DiffReactConfig(xdim=128, ydim=128))
    assert hi > lo  # finer grid -> more substeps
