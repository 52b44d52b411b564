"""2D Darcy flow data generator (PDEBench file format).

The reference's OFormer comparison trains a steady-state operator on
PDEBench/FNO Darcy datasets ("OFormer Model Comparison/nn_module/
train_darcy.py") but the fork ships no generator.  This provides one:

  -div( a(x) grad u(x) ) = f   on the unit square,  u = 0 on the boundary,

with a(x) a two-valued thresholded Gaussian random field (the FNO-paper
coefficient family: a = hi where GRF >= 0 else lo) and constant forcing
f = beta (the PDEBench DarcyFlow convention).

Discretisation: cell-centred 5-point FVM with harmonic-mean face
coefficients and Dirichlet ghost cells; the solve is matrix-free
Jacobi-preconditioned CG (``jax.scipy.sparse.linalg.cg``) — stencil
matvecs are fused elementwise XLA ops, vmapped over the batch, all under
jit on device.

On-disk format (PDEBench 2D_DarcyFlow_beta*.hdf5):
  /nu            (N, X, Y) float32   — the coefficient field a(x)
  /tensor        (N, 1, X, Y) float32 — the solution u(x)
  /x-coordinate  (X,)
  /y-coordinate  (Y,)
"""

from __future__ import annotations

import argparse
import functools
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.sim.grf import grf_rbf


def sample_coefficient(
    key, n: int, nx: int, ny: int,
    hi: float = 12.0, lo: float = 3.0, length_scale: float = 0.1,
) -> jnp.ndarray:
    """(N, X, Y) piecewise-constant thresholded-GRF coefficient."""
    keys = jax.random.split(key, n)
    g = jax.vmap(lambda k: grf_rbf(k, (nx, ny), length_scale))(keys)
    return jnp.where(g >= 0.0, hi, lo).astype(jnp.float32)


def _face_coeffs(a: jnp.ndarray, h: float):
    """Harmonic-mean transmissibilities on the four faces of each cell.

    Boundary faces keep the cell's own coefficient (ghost cell mirrors a,
    u_ghost = -u so that u = 0 on the face).
    """
    harm = lambda p, q: 2.0 * p * q / (p + q)
    aw = jnp.concatenate([a[:, :1], harm(a[:, :-1], a[:, 1:])], axis=1)
    ae = jnp.concatenate([harm(a[:, :-1], a[:, 1:]), a[:, -1:]], axis=1)
    as_ = jnp.concatenate([a[:, :, :1], harm(a[:, :, :-1], a[:, :, 1:])], axis=2)
    an = jnp.concatenate([harm(a[:, :, :-1], a[:, :, 1:]), a[:, :, -1:]], axis=2)
    scale = 1.0 / (h * h)
    # Dirichlet ghost: flux through a boundary face is 2*a/h^2 * u_cell
    bw = jnp.zeros_like(aw).at[:, 0].set(aw[:, 0])
    be = jnp.zeros_like(ae).at[:, -1].set(ae[:, -1])
    bs = jnp.zeros_like(as_).at[:, :, 0].set(as_[:, :, 0])
    bn = jnp.zeros_like(an).at[:, :, -1].set(an[:, :, -1])
    return (aw * scale, ae * scale, as_ * scale, an * scale,
            bw * scale, be * scale, bs * scale, bn * scale)


def darcy_operator(a: jnp.ndarray, h: float):
    """Returns (matvec, diag) for A u = -div(a grad u), batched (N,X,Y)."""
    aw, ae, as_, an, bw, be, bs, bn = _face_coeffs(a, h)
    diag = aw + ae + as_ + an + bw + be + bs + bn

    def matvec(u):
        uw = jnp.concatenate([jnp.zeros_like(u[:, :1]), u[:, :-1]], axis=1)
        ue = jnp.concatenate([u[:, 1:], jnp.zeros_like(u[:, :1])], axis=1)
        us = jnp.concatenate([jnp.zeros_like(u[:, :, :1]), u[:, :, :-1]], axis=2)
        un = jnp.concatenate([u[:, :, 1:], jnp.zeros_like(u[:, :, :1])], axis=2)
        return diag * u - aw * uw - ae * ue - as_ * us - an * un

    return matvec, diag


@functools.partial(jax.jit, static_argnames=("maxiter",))
def solve_darcy(
    a: jnp.ndarray,  # (N, X, Y)
    beta: float = 1.0,
    tol: float = 1e-8,
    maxiter: int = 4000,
) -> jnp.ndarray:
    """(N, X, Y) solution of -div(a grad u) = beta, u|boundary = 0."""
    n, nx, ny = a.shape
    h = 1.0 / nx
    matvec, diag = darcy_operator(a, h)
    rhs = jnp.full_like(a, beta)
    u, _ = jax.scipy.sparse.linalg.cg(
        matvec, rhs, tol=tol, maxiter=maxiter, M=lambda r: r / diag
    )
    return u.astype(jnp.float32)


def generate_darcy_file(
    out: str | Path,
    n_samples: int = 128,
    nx: int = 128,
    beta: float = 1.0,
    hi: float = 12.0,
    lo: float = 3.0,
    length_scale: float = 0.1,
    seed: int = 0,
    batch: int = 64,
) -> Path:
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    coords = (np.arange(nx, dtype=np.float32) + 0.5) / nx
    with h5py.File(out, "w") as f:
        dnu = f.create_dataset("nu", (n_samples, nx, nx), dtype="float32",
                               chunks=(1, nx, nx), compression="lzf")
        dts = f.create_dataset("tensor", (n_samples, 1, nx, nx), dtype="float32",
                               chunks=(1, 1, nx, nx), compression="lzf")
        f.create_dataset("x-coordinate", data=coords)
        f.create_dataset("y-coordinate", data=coords)
        f.attrs["beta"] = beta
        for b0 in range(0, n_samples, batch):
            nb = min(batch, n_samples - b0)
            key, kb = jax.random.split(key)
            a = sample_coefficient(kb, nb, nx, nx, hi=hi, lo=lo,
                                   length_scale=length_scale)
            u = solve_darcy(a, beta=beta)
            dnu[b0 : b0 + nb] = np.asarray(a)
            dts[b0 : b0 + nb] = np.asarray(u)[:, None]
    return out


def load_pdebench_darcy(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """PDEBench Darcy file -> (a (N,X,Y), u (N,X,Y)) float32."""
    with h5py.File(path, "r") as f:
        a = np.asarray(f["nu"], dtype=np.float32)
        u = np.asarray(f["tensor"], dtype=np.float32)
    if u.ndim == 4:
        u = u[:, 0]
    return a, u


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="data/2D_DarcyFlow_beta1.0.h5")
    p.add_argument("--nsample", type=int, default=128)
    p.add_argument("--xdim", type=int, default=128)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--hi", type=float, default=12.0)
    p.add_argument("--lo", type=float, default=3.0)
    p.add_argument("--length-scale", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=64)
    a = p.parse_args(argv)
    path = generate_darcy_file(
        a.out, n_samples=a.nsample, nx=a.xdim, beta=a.beta, hi=a.hi, lo=a.lo,
        length_scale=a.length_scale, seed=a.seed, batch=a.batch,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
