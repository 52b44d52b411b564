"""Gaussian-random-field / spectral noise initial conditions.

Two flavours:
  - ``grf_rbf``: isotropic RBF-covariance GRF via spectral sampling —
    capability of the reference's attic sampler
    (``pdebench/data_gen/src/_attic/grf.py:7-47``).
  - ``spectral_noise``: power-law smooth noise matching the *behaviour* of
    phiflow's ``Noise(scale=…, smoothness=…)`` used to initialise NS
    velocity/particles/force (reference sim_ns_incomp_2d.py:244-278): white
    noise shaped by |k|^-smoothness, band-limited, normalised to the
    requested std ("scale").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# NOTE: both samplers are jitted — on some TPU runtimes *eager* complex
# arithmetic is UNIMPLEMENTED (compiled complex ops are fine), so these must
# never run op-by-op.
@functools.partial(jax.jit, static_argnames=("shape", "length_scale"))
def grf_rbf(key, shape: tuple[int, int], length_scale: float = 0.1) -> jnp.ndarray:
    """RBF-covariance GRF on the unit square via circulant embedding."""
    nx, ny = shape
    kx = jnp.fft.fftfreq(nx)[:, None] * nx
    ky = jnp.fft.fftfreq(ny)[None, :] * ny
    # spectral density of the RBF kernel (Gaussian in k)
    s = jnp.exp(-2.0 * (jnp.pi * length_scale) ** 2 * ((kx / nx) ** 2 + (ky / ny) ** 2) * (nx * ny))
    w = jax.random.normal(key, shape) + 1j * jax.random.normal(jax.random.split(key)[0], shape)
    f = jnp.fft.ifft2(jnp.sqrt(s) * w).real
    return f / (jnp.std(f) + 1e-12)


@functools.partial(jax.jit, static_argnames=("shape", "scale", "smoothness"))
def spectral_noise(
    key,
    shape: tuple[int, ...],
    scale: float = 0.15,
    smoothness: float = 3.0,
) -> jnp.ndarray:
    """Smooth random field: |k|^-smoothness shaped white noise, std=scale.

    shape: (..., nx, ny) — leading dims are batch/channel, all drawn iid.
    Built from an explicit DFT-free construction: filter white noise with a
    radially decaying spectrum (uses fft over the trailing two dims).
    """
    nx, ny = shape[-2], shape[-1]
    kx = jnp.fft.fftfreq(nx)[:, None]
    ky = jnp.fft.fftfreq(ny)[None, :]
    k = jnp.sqrt(kx**2 + ky**2)
    k = k.at[0, 0].set(1.0)
    amp = k ** (-float(smoothness))
    amp = amp.at[0, 0].set(0.0)  # zero mean
    # band-limit the highest frequencies a little for smoothness parity
    amp = jnp.where(k > 0.45, 0.0, amp)

    kr, ki = jax.random.split(key)
    w = jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)
    f = jnp.fft.ifft2(w * amp, axes=(-2, -1)).real
    std = jnp.std(f, axis=(-2, -1), keepdims=True) + 1e-12
    return f / std * scale
