"""1D viscous Burgers data generator (PDEBench file format).

The reference's OFormer/Hyena comparison suites train on PDEBench 1D
Burgers datasets ("OFormer Model Comparison/nn_module/train_burgers.py",
``dataset.py``) but the fork ships no generator for them.  This provides
a TPU-native one so the comparison drivers run end to end on real data.

Physics: u_t + u u_x = nu u_xx on the periodic unit interval.
Scheme: pseudo-spectral with 2/3 dealiasing; stiff diffusion handled
exactly by an integrating factor exp(-nu k^2 dt); Heun (RK2) on the
advection term; the whole trajectory is one ``lax.scan``.  Only complex
fft/ifft are used (this TPU runtime does not lower irfft — see
PERFORMANCE.md), and everything runs under jit.

Initial condition: random superposition of sinusoids with wavenumbers
<= ``max_k``, normalised to max|u| = 1 (the PDEBench Burgers IC family).
Because Burgers obeys a maximum principle, |u| <= 1 for all time, so a
static CFL timestep is sound inside jit.

On-disk format (PDEBench 1D convention, e.g. 1D_Burgers_Sols_Nu0.01.hdf5):
  /tensor        (N, T, X) float32
  /x-coordinate  (X,)
  /t-coordinate  (T,)
"""

from __future__ import annotations

import argparse
import functools
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np


def random_sine_ic(key, n: int, nx: int, max_k: int = 8) -> jnp.ndarray:
    """(N, X) superposed sinusoids, max|u| = 1."""
    ka, kp, km = jax.random.split(key, 3)
    ks = jnp.arange(1, max_k + 1, dtype=jnp.float32)
    amp = jax.random.normal(ka, (n, max_k))
    # random per-mode participation so fields vary in smoothness
    amp = amp * (jax.random.uniform(km, (n, max_k)) < 0.6)
    phase = jax.random.uniform(kp, (n, max_k), maxval=2.0 * jnp.pi)
    x = jnp.linspace(0.0, 1.0, nx, endpoint=False)
    u0 = jnp.sum(
        amp[:, :, None] * jnp.sin(2.0 * jnp.pi * ks[None, :, None] * x[None, None, :]
                                  + phase[:, :, None]),
        axis=1,
    )
    peak = jnp.max(jnp.abs(u0), axis=1, keepdims=True) + 1e-12
    return u0 / peak


@functools.partial(
    jax.jit, static_argnames=("nx", "n_frames", "substeps_per_frame")
)
def simulate_burgers(
    u0: jnp.ndarray,  # (B, X) with |u| <= 1
    nu: float,
    t_final: float,
    nx: int,
    n_frames: int,
    substeps_per_frame: int,
) -> jnp.ndarray:
    """(B, n_frames, X) trajectory including the initial frame."""
    k = 2.0 * jnp.pi * jnp.fft.fftfreq(nx) * nx  # wavenumbers on [0,1)
    ik = 1j * k
    dealias = (jnp.abs(k) <= (2.0 / 3.0) * jnp.pi * nx).astype(jnp.complex64)
    dt = t_final / ((n_frames - 1) * substeps_per_frame)
    ef = jnp.exp(-nu * k**2 * dt).astype(jnp.complex64)

    def nonlin(u_hat):
        u = jnp.fft.ifft(u_hat, axis=-1).real
        ux = jnp.fft.ifft(ik * u_hat, axis=-1).real
        return jnp.fft.fft(-u * ux, axis=-1) * dealias

    def substep(u_hat, _):
        n0 = nonlin(u_hat)
        u1 = ef * (u_hat + dt * n0)
        n1 = nonlin(u1)
        u_next = ef * u_hat + 0.5 * dt * (ef * n0 + n1)
        return u_next, None

    def frame(u_hat, _):
        u_hat, _ = jax.lax.scan(substep, u_hat, None, length=substeps_per_frame)
        return u_hat, jnp.fft.ifft(u_hat, axis=-1).real

    u_hat0 = jnp.fft.fft(u0.astype(jnp.complex64), axis=-1)
    _, frames = jax.lax.scan(frame, u_hat0, None, length=n_frames - 1)
    traj = jnp.concatenate([u0[None], frames], axis=0)  # (T, B, X)
    return jnp.swapaxes(traj, 0, 1).astype(jnp.float32)


def generate_burgers_file(
    out: str | Path,
    n_samples: int = 32,
    nx: int = 1024,
    n_frames: int = 201,
    t_final: float = 2.0,
    nu: float = 0.01,
    max_k: int = 8,
    seed: int = 0,
    batch: int = 32,
    cfl: float = 0.4,
) -> Path:
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    dx = 1.0 / nx
    # |u| <= 1 (maximum principle) -> advective dt bound is cfl*dx; the
    # integrating factor removes the diffusive restriction entirely
    dt_frame = t_final / (n_frames - 1)
    substeps = max(int(np.ceil(dt_frame / (cfl * dx))), 1)
    key = jax.random.PRNGKey(seed)
    with h5py.File(out, "w") as f:
        dset = f.create_dataset(
            "tensor", (n_samples, n_frames, nx), dtype="float32",
            chunks=(1, n_frames, nx), compression="lzf",
        )
        f.create_dataset("x-coordinate",
                         data=np.linspace(0, 1, nx, endpoint=False, dtype=np.float32))
        f.create_dataset("t-coordinate",
                         data=np.linspace(0, t_final, n_frames, dtype=np.float32))
        f.attrs["nu"] = nu
        for b0 in range(0, n_samples, batch):
            nb = min(batch, n_samples - b0)
            key, kb = jax.random.split(key)
            u0 = random_sine_ic(kb, nb, nx, max_k=max_k)
            traj = simulate_burgers(u0, nu, t_final, nx, n_frames, substeps)
            dset[b0 : b0 + nb] = np.asarray(traj)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="data/1D_Burgers_Sols_Nu0.01.h5")
    p.add_argument("--nsample", type=int, default=32)
    p.add_argument("--xdim", type=int, default=1024)
    p.add_argument("--tdim", type=int, default=201)
    p.add_argument("--t", type=float, default=2.0)
    p.add_argument("--nu", type=float, default=0.01)
    p.add_argument("--max-k", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=32)
    a = p.parse_args(argv)
    path = generate_burgers_file(
        a.out, n_samples=a.nsample, nx=a.xdim, n_frames=a.tdim, t_final=a.t,
        nu=a.nu, max_k=a.max_k, seed=a.seed, batch=a.batch,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
