"""Burgers-1D and Darcy-2D generators: physics + file-format checks."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.sim.burgers_1d import (
    generate_burgers_file,
    random_sine_ic,
    simulate_burgers,
)
from sciml_pde_tpu.sim.darcy_2d import (
    darcy_operator,
    generate_darcy_file,
    load_pdebench_darcy,
    sample_coefficient,
    solve_darcy,
)

pytestmark = pytest.mark.slow


# ---------------------------------------------------------------- Burgers


def test_burgers_ic_normalized():
    u0 = random_sine_ic(jax.random.PRNGKey(0), 4, 128)
    assert u0.shape == (4, 128)
    np.testing.assert_allclose(np.max(np.abs(u0), axis=1), 1.0, rtol=1e-5)


def test_burgers_conservation_and_decay():
    # periodic Burgers conserves the mean and dissipates energy
    u0 = random_sine_ic(jax.random.PRNGKey(1), 2, 256)
    traj = simulate_burgers(u0, nu=0.01, t_final=1.0, nx=256,
                            n_frames=11, substeps_per_frame=80)
    assert traj.shape == (2, 11, 256)
    means = np.mean(np.asarray(traj), axis=2)
    np.testing.assert_allclose(
        means, np.broadcast_to(means[:, :1], means.shape), atol=1e-5
    )
    energy = np.sum(np.asarray(traj) ** 2, axis=2)
    assert np.all(np.diff(energy, axis=1) <= 1e-6)
    # maximum principle
    assert np.max(np.abs(traj)) <= 1.0 + 1e-4


def test_burgers_timestep_convergence():
    # halving the substep changes the solution only at the scheme's order
    u0 = random_sine_ic(jax.random.PRNGKey(2), 1, 256)
    kw = dict(nu=0.05, t_final=0.5, nx=256, n_frames=2)
    coarse = simulate_burgers(u0, substeps_per_frame=50, **kw)
    fine = simulate_burgers(u0, substeps_per_frame=200, **kw)
    err = np.max(np.abs(np.asarray(coarse[:, -1]) - np.asarray(fine[:, -1])))
    assert err < 2e-4


def test_burgers_file_format(tmp_path):
    out = generate_burgers_file(
        tmp_path / "1D_Burgers_Sols_Nu0.01.h5",
        n_samples=3, nx=128, n_frames=11, t_final=0.5, seed=1,
    )
    with h5py.File(out) as f:
        assert f["tensor"].shape == (3, 11, 128)
        assert f["x-coordinate"].shape == (128,)
        assert f["t-coordinate"].shape == (11,)
        assert np.isfinite(f["tensor"][:]).all()
        assert f.attrs["nu"] == pytest.approx(0.01)


# ------------------------------------------------------------------ Darcy


def test_darcy_coefficient_two_valued():
    a = sample_coefficient(jax.random.PRNGKey(0), 2, 32, 32, hi=12.0, lo=3.0)
    vals = np.unique(np.asarray(a))
    assert set(vals) <= {3.0, 12.0}
    # both phases present
    assert len(vals) == 2


def test_darcy_residual_small():
    a = sample_coefficient(jax.random.PRNGKey(3), 2, 48, 48)
    u = solve_darcy(a, beta=1.0, tol=1e-10, maxiter=6000)
    matvec, _ = darcy_operator(a, 1.0 / 48)
    res = np.asarray(matvec(u) - 1.0)
    rel = np.linalg.norm(res) / np.linalg.norm(np.ones_like(res))
    # float32 CG stalls around ~1e-4 relative residual
    assert rel < 1e-3
    # positivity (maximum principle for positive forcing)
    assert np.min(np.asarray(u)) >= 0.0


def test_darcy_constant_coefficient_matches_poisson():
    # a == 1 reduces to the Poisson problem; check against a dense solve
    n = 24
    a = jnp.ones((1, n, n))
    u = np.asarray(solve_darcy(a, beta=1.0, tol=1e-12, maxiter=4000))[0]
    # dense 5-point Laplacian with Dirichlet ghosts, same discretisation
    h = 1.0 / n
    N = n * n
    A = np.zeros((N, N))
    for i in range(n):
        for j in range(n):
            r = i * n + j
            diag = 0.0
            for di, dj, bnd in ((-1, 0, i == 0), (1, 0, i == n - 1),
                                (0, -1, j == 0), (0, 1, j == n - 1)):
                if bnd:
                    diag += 2.0  # Dirichlet ghost face (2*a/h^2), a=1
                else:
                    diag += 1.0
                    A[r, (i + di) * n + (j + dj)] = -1.0
            A[r, r] = diag
    A /= h * h
    # boundary face transmissibility in the implementation is a/h^2*... match:
    u_dense = np.linalg.solve(A, np.ones(N)).reshape(n, n)
    np.testing.assert_allclose(u, u_dense, rtol=2e-5, atol=2e-7)


def test_darcy_file_roundtrip(tmp_path):
    out = generate_darcy_file(tmp_path / "2D_DarcyFlow_beta1.0.h5",
                              n_samples=3, nx=32, seed=2)
    with h5py.File(out) as f:
        assert f["nu"].shape == (3, 32, 32)
        assert f["tensor"].shape == (3, 1, 32, 32)
        assert f["x-coordinate"].shape == (32,)
    a, u = load_pdebench_darcy(out)
    assert a.shape == (3, 32, 32) and u.shape == (3, 32, 32)
    assert np.isfinite(u).all()
