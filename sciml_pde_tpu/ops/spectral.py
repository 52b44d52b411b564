"""Spectral convolution primitives (the FNO hot path).

Semantics match the reference ``SpectralConv2d_fast``/``SpectralConv3d``
(``pdebench/models/fno/fno.py:35-92,191-288``): real FFT over the spatial
dims, complex channel-mixing einsum on the retained corner mode blocks, zero
elsewhere, inverse real FFT.

TPU-first design notes:
  - arrays are channels-last ``(B, *spatial, C)`` so the mode einsum
    contracts the minor-most dim (MXU friendly) and no transposes are needed
    around the XLA FFT;
  - complex weights are stored as one real array ``(2, Cin, Cout, *modes)``
    (real, imag) so optimizers/checkpointing see only real leaves.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _as_complex(w: jnp.ndarray) -> jnp.ndarray:
    """(2, ...) real/imag stack -> complex."""
    return jnp.asarray(w[0], jnp.float32) + 1j * jnp.asarray(w[1], jnp.float32)


def _mode_mix(x_blk: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Complex channel mix on a mode block.

    x_blk: (B, m1, m2[, m3], Cin) complex; w: (Cin, Cout, m1, m2[, m3]) complex.
    Returns (B, m1, m2[, m3], Cout).
    """
    if x_blk.ndim == 4:
        return jnp.einsum("bxyi,ioxy->bxyo", x_blk, w)
    return jnp.einsum("bxyzi,ioxyz->bxyzo", x_blk, w)


def spectral_conv_2d(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    modes1: int,
    modes2: int,
) -> jnp.ndarray:
    """2D spectral convolution.

    Args:
      x: (B, H, W, Cin) real.
      w1, w2: (2, Cin, Cout, modes1, modes2) real/imag stacks for the
        low-frequency (rows [:m1]) and high-frequency (rows [-m1:]) blocks.
    Returns: (B, H, W, Cout) real.
    """
    h, w = x.shape[1], x.shape[2]
    xf = jnp.fft.rfft2(x, axes=(1, 2))  # (B, H, W//2+1, Cin)

    top = _mode_mix(xf[:, :modes1, :modes2], _as_complex(w1))
    bot = _mode_mix(xf[:, h - modes1 :, :modes2], _as_complex(w2))

    out_ft = jnp.zeros(
        (x.shape[0], h, w // 2 + 1, top.shape[-1]), dtype=jnp.complex64
    )
    out_ft = out_ft.at[:, :modes1, :modes2].set(top)
    out_ft = out_ft.at[:, h - modes1 :, :modes2].set(bot)
    return jnp.fft.irfft2(out_ft, s=(h, w), axes=(1, 2))


def spectral_conv_3d(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    w3: jnp.ndarray,
    w4: jnp.ndarray,
    modes1: int,
    modes2: int,
    modes3: int,
) -> jnp.ndarray:
    """3D spectral convolution with the four corner blocks of the reference
    (fno.py:259-288): (+x,+y), (-x,+y), (+x,-y), (-x,-y), all at low z modes.

    x: (B, X, Y, Z, Cin); w*: (2, Cin, Cout, m1, m2, m3).
    """
    nx, ny, nz = x.shape[1], x.shape[2], x.shape[3]
    xf = jnp.fft.rfftn(x, axes=(1, 2, 3))  # (B, X, Y, Z//2+1, Cin)

    blocks = [
        (slice(0, modes1), slice(0, modes2), w1),
        (slice(nx - modes1, nx), slice(0, modes2), w2),
        (slice(0, modes1), slice(ny - modes2, ny), w3),
        (slice(nx - modes1, nx), slice(ny - modes2, ny), w4),
    ]
    out_ft = jnp.zeros(
        (x.shape[0], nx, ny, nz // 2 + 1, w1.shape[2]), dtype=jnp.complex64
    )
    for sx, sy, w in blocks:
        mixed = _mode_mix(xf[:, sx, sy, :modes3], _as_complex(w))
        out_ft = out_ft.at[:, sx, sy, :modes3].set(mixed)
    return jnp.fft.irfftn(out_ft, s=(nx, ny, nz), axes=(1, 2, 3))


def spectral_weight_init(key, in_channels: int, out_channels: int, *modes):
    """Reference init (fno.py:52-63): scale * U[0,1) for real and imag,
    scale = 1/(Cin*Cout).  Returned as a (2, Cin, Cout, *modes) real stack."""
    import jax

    scale = 1.0 / (in_channels * out_channels)
    shape = (2, in_channels, out_channels) + tuple(modes)
    return scale * jax.random.uniform(key, shape, dtype=jnp.float32)


def naive_spectral_conv_2d_numpy(x, w1c, w2c, m1, m2):
    """Numpy oracle for tests: direct translation of the math definition."""
    b, h, w, ci = x.shape
    co = w1c.shape[1]
    xf = np.fft.rfft2(x, axes=(1, 2))
    out = np.zeros((b, h, w // 2 + 1, co), dtype=np.complex128)
    out[:, :m1, :m2] = np.einsum("bxyi,ioxy->bxyo", xf[:, :m1, :m2], w1c)
    out[:, h - m1 :, :m2] = np.einsum("bxyi,ioxy->bxyo", xf[:, h - m1 :, :m2], w2c)
    return np.fft.irfft2(out, s=(h, w), axes=(1, 2))
