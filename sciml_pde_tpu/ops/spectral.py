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
import os

import jax
import jax.numpy as jnp
import numpy as np

# Matmul precision of the DFT/mode einsums.  HIGHEST = exact f32 (6-pass
# bf16 on TPU); HIGH = bf16_3x (~f32 accuracy at half the MXU passes).
# Configurable for perf studies: SCIML_DFT_PRECISION={highest,high,default}.
_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}[os.environ.get("SCIML_DFT_PRECISION", "highest").lower()]


def set_dft_precision(name: str) -> None:
    global _PRECISION
    _PRECISION = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[name.lower()]


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
    """Partial-DFT bases along one axis of length n, as (real, imag) float32
    pairs — complex arrays never touch device_put (some TPU runtimes cannot
    H2D-transfer complex dtypes), and the split-real form lets the inverse
    compute only the real part of the output.

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
        ang_f = -2 * np.pi * np.outer(xs, ks) / n
        c = np.where((ks > 0) & (ks < n / 2), 2.0, 1.0)[:, None]
        ang_i = 2 * np.pi * np.outer(ks, xs) / n
        fwd = (np.cos(ang_f), np.sin(ang_f))
        inv = (c * np.cos(ang_i) / n, c * np.sin(ang_i) / n)
    else:
        ks = np.asarray(rows)
        ang_f = -2 * np.pi * np.outer(xs, ks) / n
        ang_i = 2 * np.pi * np.outer(ks, xs) / n
        fwd = (np.cos(ang_f), np.sin(ang_f))
        inv = (np.cos(ang_i) / n, np.sin(ang_i) / n)
    return (
        tuple(a.astype(np.float32) for a in fwd),
        tuple(a.astype(np.float32) for a in inv),
    )


def _cmul_mm(ar, ai, br, bi, eq: str, prec):
    """Complex multiply-contract via real einsums: (ar+i ai) x (br+i bi)."""
    rr = jnp.einsum(eq, ar, br, precision=prec)
    if ai is None:  # real input (forward transform of a real signal)
        return rr, jnp.einsum(eq, ar, bi, precision=prec)
    return (
        rr - jnp.einsum(eq, ai, bi, precision=prec),
        jnp.einsum(eq, ar, bi, precision=prec) + jnp.einsum(eq, ai, br, precision=prec),
    )


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

    # ---- partial-DFT (MXU matmul) path, pure-real arithmetic -------------
    prec = _PRECISION
    (fwr, fwi), (iwr, iwi) = _dft_factors_1d(w, modes2, None)
    (fhr, fhi), (ihr, ihi) = _dft_factors_1d(h, 2 * modes1, _corner_rows(h, modes1))

    # W-axis partial rDFT of the real signal: (B,H,W,C) @ (W,m2)
    xwr, xwi = _cmul_mm(x, None, jnp.asarray(fwr), jnp.asarray(fwi), "bhwc,wk->bhkc", prec)
    # H-axis partial DFT on the retained corner rows: -> (B,2m1,m2,C)
    xfr, xfi = _cmul_mm(xwr, xwi, jnp.asarray(fhr), jnp.asarray(fhi), "bhkc,hr->brkc", prec)

    # mode mixing: stack the two corner-row weight blocks along the row axis
    wr = jnp.concatenate([w1[0], w2[0]], axis=2)  # (Ci,Co,2m1,m2)
    wi = jnp.concatenate([w1[1], w2[1]], axis=2)
    yfr, yfi = _cmul_mm(xfr, xfi, wr, wi, "brkc,cork->brko", prec)

    # inverse: H rows back to physical (complex), then the Hermitian-weighted
    # W inverse — only the real part of the output is needed:
    # Re[(yr + i yi)(gr + i gi)] = yr gr - yi gi
    yhr, yhi = _cmul_mm(yfr, yfi, jnp.asarray(ihr), jnp.asarray(ihi), "brko,rh->bhko", prec)
    out = jnp.einsum("bhko,kw->bhwo", yhr, jnp.asarray(iwr), precision=prec) - jnp.einsum(
        "bhko,kw->bhwo", yhi, jnp.asarray(iwi), precision=prec
    )
    return out


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

    # ---- partial-DFT (MXU matmul) path, pure-real arithmetic -------------
    prec = _PRECISION
    (fzr, fzi), (izr, izi) = _dft_factors_1d(nz, modes3, None)
    (fxr, fxi), (ixr, ixi) = _dft_factors_1d(nx, 2 * modes1, _corner_rows(nx, modes1))
    (fyr, fyi), (iyr, iyi) = _dft_factors_1d(ny, 2 * modes2, _corner_rows(ny, modes2))

    ar, ai = _cmul_mm(x, None, jnp.asarray(fzr), jnp.asarray(fzi), "bxyzc,zk->bxykc", prec)
    ar, ai = _cmul_mm(ar, ai, jnp.asarray(fyr), jnp.asarray(fyi), "bxykc,ys->bxskc", prec)
    ar, ai = _cmul_mm(ar, ai, jnp.asarray(fxr), jnp.asarray(fxi), "bxskc,xr->brskc", prec)

    # weight layout on the (2m1, 2m2) corner grid:
    #   rows [:m1] = +x block, rows [m1:] = -x block;
    #   cols [:m2] = +y block, cols [m2:] = -y block
    def corner(part):
        top = jnp.concatenate([w1[part], w3[part]], axis=3)  # (Ci,Co,m1,2m2,m3)
        bot = jnp.concatenate([w2[part], w4[part]], axis=3)
        return jnp.concatenate([top, bot], axis=2)  # (Ci,Co,2m1,2m2,m3)

    ar, ai = _cmul_mm(ar, ai, corner(0), corner(1), "brskc,corsk->brsko", prec)
    ar, ai = _cmul_mm(ar, ai, jnp.asarray(ixr), jnp.asarray(ixi), "brsko,rx->bxsko", prec)
    ar, ai = _cmul_mm(ar, ai, jnp.asarray(iyr), jnp.asarray(iyi), "bxsko,sy->bxyko", prec)
    out = jnp.einsum("bxyko,kz->bxyzo", ar, jnp.asarray(izr), precision=prec) - jnp.einsum(
        "bxyko,kz->bxyzo", ai, jnp.asarray(izi), precision=prec
    )
    return out


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
