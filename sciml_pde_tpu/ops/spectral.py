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
    (real, imag) so optimizers/checkpointing see only real leaves;
  - the default implementation ("dft") never materialises the full spectrum:
    because FNO keeps only O(m) of O(N) modes, the forward transform is a
    *partial* DFT (two skinny matmuls on the MXU) and the inverse is the
    adjoint pair with Hermitian doubling along the real-FFT axis.  This is
    the TurboFNO "fused FFT-GEMM-iFFT" idea expressed as dense GEMMs, which
    on TPU beats a full XLA FFT over a mostly-zero spectrum (and avoids the
    FFT op entirely).  ``impl="fft"`` keeps the jnp.fft path for
    cross-checking; both are bit-compatible within float tolerance.
"""

from __future__ import annotations

import functools

import jax
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


@functools.lru_cache(maxsize=128)
def _dft_factors_1d(n: int, modes: int, rows: tuple[int, ...] | None):
    """Partial-DFT bases along one axis of length n.

    If ``rows`` is None: retained frequencies are 0..modes-1 (the rfft axis).
      fwd:  (n, modes)  e^{-2pi i k x / n}
      inv:  (modes, n)  c_k e^{+2pi i k x / n} / n  with Hermitian doubling
            c_0 = 1, c_k = 2 for 0 < k < n/2, c_{n/2} = 1.
    Else ``rows`` lists retained (possibly negative-wrapped) frequencies for
    a full-complex axis; inv has no doubling.
    """
    xs = np.arange(n)
    if rows is None:
        ks = np.arange(modes)
        fwd = np.exp(-2j * np.pi * np.outer(xs, ks) / n)
        c = np.where((ks > 0) & (ks < n / 2), 2.0, 1.0)
        inv = c[:, None] * np.exp(2j * np.pi * np.outer(ks, xs) / n) / n
    else:
        ks = np.asarray(rows)
        fwd = np.exp(-2j * np.pi * np.outer(xs, ks) / n)
        inv = np.exp(2j * np.pi * np.outer(ks, xs) / n) / n
    return fwd.astype(np.complex64), inv.astype(np.complex64)


def _corner_rows(n: int, m: int) -> tuple[int, ...]:
    """Frequencies [0..m-1] ∪ [n-m..n-1] (the two corner blocks)."""
    return tuple(range(m)) + tuple(range(n - m, n))


def spectral_conv_2d(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    modes1: int,
    modes2: int,
    impl: str = "dft",
) -> jnp.ndarray:
    """2D spectral convolution.

    Args:
      x: (B, H, W, Cin) real.
      w1, w2: (2, Cin, Cout, modes1, modes2) real/imag stacks for the
        low-frequency (rows [:m1]) and high-frequency (rows [-m1:]) blocks.
    Returns: (B, H, W, Cout) real.
    """
    h, w = x.shape[1], x.shape[2]
    if impl == "fft":
        xf = jnp.fft.rfft2(x, axes=(1, 2))  # (B, H, W//2+1, Cin)
        top = _mode_mix(xf[:, :modes1, :modes2], _as_complex(w1))
        bot = _mode_mix(xf[:, h - modes1 :, :modes2], _as_complex(w2))
        out_ft = jnp.zeros(
            (x.shape[0], h, w // 2 + 1, top.shape[-1]), dtype=jnp.complex64
        )
        out_ft = out_ft.at[:, :modes1, :modes2].set(top)
        out_ft = out_ft.at[:, h - modes1 :, :modes2].set(bot)
        return jnp.fft.irfft2(out_ft, s=(h, w), axes=(1, 2))

    # ---- partial-DFT (MXU matmul) path ----------------------------------
    prec = jax.lax.Precision.HIGHEST
    fwd_w, inv_w = _dft_factors_1d(w, modes2, None)
    fwd_h, inv_h = _dft_factors_1d(h, 2 * modes1, _corner_rows(h, modes1))
    fwd_w, inv_w = jnp.asarray(fwd_w), jnp.asarray(inv_w)
    fwd_h, inv_h = jnp.asarray(fwd_h), jnp.asarray(inv_h)

    xc = x.astype(jnp.complex64)
    # W-axis partial rDFT: (B,H,W,C) @ (W,m2) -> (B,H,m2,C)
    xw = jnp.einsum("bhwc,wk->bhkc", xc, fwd_w, precision=prec)
    # H-axis partial DFT on the retained corner rows: -> (B,2m1,m2,C)
    xf = jnp.einsum("bhkc,hr->brkc", xw, fwd_h, precision=prec)

    # mode mixing: stack the two corner-row weight blocks along the row axis
    wc = jnp.concatenate([_as_complex(w1), _as_complex(w2)], axis=2)  # (Ci,Co,2m1,m2)
    yf = jnp.einsum("brkc,cork->brko", xf, wc, precision=prec)

    # inverse: H rows back to physical, then Hermitian-weighted W inverse
    yh = jnp.einsum("brko,rh->bhko", yf, inv_h, precision=prec)
    out = jnp.einsum("bhko,kw->bhwo", yh, inv_w, precision=prec)
    return jnp.real(out)


def spectral_conv_3d(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    w2: jnp.ndarray,
    w3: jnp.ndarray,
    w4: jnp.ndarray,
    modes1: int,
    modes2: int,
    modes3: int,
    impl: str = "dft",
) -> jnp.ndarray:
    """3D spectral convolution with the four corner blocks of the reference
    (fno.py:259-288): (+x,+y), (-x,+y), (+x,-y), (-x,-y), all at low z modes.

    x: (B, X, Y, Z, Cin); w*: (2, Cin, Cout, m1, m2, m3).
    """
    nx, ny, nz = x.shape[1], x.shape[2], x.shape[3]
    if impl == "fft":
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

    # ---- partial-DFT (MXU matmul) path ----------------------------------
    prec = jax.lax.Precision.HIGHEST
    fwd_z, inv_z = _dft_factors_1d(nz, modes3, None)
    fwd_x, inv_x = _dft_factors_1d(nx, 2 * modes1, _corner_rows(nx, modes1))
    fwd_y, inv_y = _dft_factors_1d(ny, 2 * modes2, _corner_rows(ny, modes2))
    fwd_z, inv_z = jnp.asarray(fwd_z), jnp.asarray(inv_z)
    fwd_x, inv_x = jnp.asarray(fwd_x), jnp.asarray(inv_x)
    fwd_y, inv_y = jnp.asarray(fwd_y), jnp.asarray(inv_y)

    xc = x.astype(jnp.complex64)
    xz = jnp.einsum("bxyzc,zk->bxykc", xc, fwd_z, precision=prec)
    xzy = jnp.einsum("bxykc,ys->bxskc", xz, fwd_y, precision=prec)
    xf = jnp.einsum("bxskc,xr->brskc", xzy, fwd_x, precision=prec)  # (B,2m1,2m2,m3,C)

    # weight layout on the (2m1, 2m2) corner grid:
    #   rows [:m1] = +x block, rows [m1:] = -x block;
    #   cols [:m2] = +y block, cols [m2:] = -y block
    wtop = jnp.concatenate([_as_complex(w1), _as_complex(w3)], axis=3)  # (Ci,Co,m1,2m2,m3)
    wbot = jnp.concatenate([_as_complex(w2), _as_complex(w4)], axis=3)
    wc = jnp.concatenate([wtop, wbot], axis=2)  # (Ci,Co,2m1,2m2,m3)

    yf = jnp.einsum("brskc,corsk->brsko", xf, wc, precision=prec)
    yx = jnp.einsum("brsko,rx->bxsko", yf, inv_x, precision=prec)
    yxy = jnp.einsum("bxsko,sy->bxyko", yx, inv_y, precision=prec)
    out = jnp.einsum("bxyko,kz->bxyzo", yxy, inv_z, precision=prec)
    return jnp.real(out)


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
