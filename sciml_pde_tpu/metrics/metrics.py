"""Evaluation metrics, pure ``jax.numpy`` and fully jittable.

Re-provides the PDEBench metric suite (reference
``pdebench/models/metrics.py:164-306``): RMSE, normalized RMSE, conserved
variable RMSE, max error, boundary RMSE and radially-binned Fourier-space
RMSE (low/mid/high bands), plus the loss library
(``LpLoss``/``FftLpLoss``/``FftMseLoss``, ``metrics.py:531-650``) and the
inverse-problem metric dict (``metrics.py:653-749``).

TPU-first changes vs the reference:
  - the O(N^2)/O(N^3) Python loops over wavenumber pairs
    (reference ``metrics.py:270-275,283-289``) are replaced by a vectorized
    ``segment_sum`` over a precomputed (static, trace-time) radial-bin map;
  - everything is shape-static and jit/vmap/pjit friendly, so the whole
    rollout + metric computation runs as one compiled program on device.

Array convention matches the reference *loader* outputs: channels-last
``(B, x1, ..., xd, T, C)`` for d in {1, 2, 3}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _channels_first(x: jnp.ndarray) -> jnp.ndarray:
    """(B, *spatial, T, C) -> (B, C, *spatial, T), as reference metrics.py:177-185."""
    perm = (0, x.ndim - 1) + tuple(range(1, x.ndim - 1))
    return jnp.transpose(x, perm)


@functools.lru_cache(maxsize=64)
def _radial_bins(spatial: tuple[int, ...]) -> tuple[np.ndarray, int]:
    """Static radial-bin id for each retained wavenumber tuple.

    Matches reference ``metrics.py:269-289``: only indices ``i < n_k // 2``
    per dim are binned, bin = floor(sqrt(sum i^2)), bins >= min(n//2)-1+1
    are dropped (id -> num_bins, later sliced off).
    """
    half = [n // 2 for n in spatial]
    nbins = min(half)
    grids = np.meshgrid(*[np.arange(h) for h in half], indexing="ij")
    r = np.floor(np.sqrt(sum(g.astype(np.float64) ** 2 for g in grids))).astype(np.int32)
    bin_id = np.where(r > nbins - 1, nbins, r)  # overflow bucket at nbins
    return bin_id, nbins


def _fourier_rmse(
    pred_cf: jnp.ndarray,
    target_cf: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Radially-binned Fourier RMSE.

    pred_cf/target_cf: (B, C, *spatial, T).  Returns (C, nbins, T).
    """
    ndim_sp = pred_cf.ndim - 3
    axes = tuple(range(2, 2 + ndim_sp))
    spatial = tuple(pred_cf.shape[2 : 2 + ndim_sp])

    pf = jnp.fft.fftn(pred_cf, axes=axes)
    tf = jnp.fft.fftn(target_cf, axes=axes)
    err2 = jnp.abs(pf - tf) ** 2  # (B, C, *spatial, T)

    if ndim_sp == 1:
        # 1D reference path uses rfft and no radial binning (metrics.py:257-263)
        n = spatial[0]
        pf = jnp.fft.rfft(pred_cf, axis=2)
        tf = jnp.fft.rfft(target_cf, axis=2)
        return jnp.sqrt(jnp.mean(jnp.abs(pf - tf) ** 2, axis=0)) / n * scale

    bin_id, nbins = _radial_bins(spatial)
    half = [n // 2 for n in spatial]
    sl = (slice(None), slice(None)) + tuple(slice(0, h) for h in half)
    err2 = err2[sl]  # (B, C, *half, T)
    b, c, t = err2.shape[0], err2.shape[1], err2.shape[-1]
    flat = err2.reshape(b, c, -1, t)
    seg = jax.ops.segment_sum(
        jnp.moveaxis(flat, 2, 0), jnp.asarray(bin_id.ravel()), num_segments=nbins + 1
    )  # (nbins+1, B, C, T)
    binned = jnp.moveaxis(seg[:nbins], 0, 2)  # (B, C, nbins, T)
    return jnp.sqrt(jnp.mean(binned, axis=0)) / float(np.prod(spatial)) * scale


def metric_func(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    if_mean: bool = True,
    Lx: float = 1.0,
    Ly: float = 1.0,
    Lz: float = 1.0,
    iLow: int = 4,
    iHigh: int = 12,
):
    """The six PDEBench metrics (reference ``metrics.py:164-306``).

    Args:
      pred, target: ``(B, *spatial, T, C)`` with 1-3 spatial dims.
    Returns:
      (err_RMSE, err_nRMSE, err_CSV, err_Max, err_BD, err_F) — scalars if
      ``if_mean`` else per-(C, T) arrays (err_F: (C, 3, T)).
    """
    pred = _channels_first(pred.astype(jnp.float32))
    target = _channels_first(target.astype(jnp.float32))
    nb, nc, nt = pred.shape[0], pred.shape[1], pred.shape[-1]
    ndim_sp = pred.ndim - 3
    spatial = pred.shape[2 : 2 + ndim_sp]
    nxyz = int(np.prod(spatial))

    pflat = pred.reshape(nb, nc, -1, nt)
    tflat = target.reshape(nb, nc, -1, nt)

    err_mean = jnp.sqrt(jnp.mean((pflat - tflat) ** 2, axis=2))  # (B, C, T)
    err_RMSE = jnp.mean(err_mean, axis=0)  # (C, T)
    nrm = jnp.sqrt(jnp.mean(tflat**2, axis=2))
    err_nRMSE = jnp.mean(err_mean / nrm, axis=0)

    err_CSV = (
        jnp.sqrt(jnp.mean((jnp.sum(pflat, axis=2) - jnp.sum(tflat, axis=2)) ** 2, axis=0))
        / nxyz
    )

    err_Max = jnp.max(jnp.max(jnp.abs(pflat - tflat), axis=2), axis=0)

    # Boundary RMSE: squared error summed over all domain faces
    # (reference metrics.py:227-255; corner cells counted per incident face).
    if ndim_sp == 1:
        bd = (pred[:, :, 0] - target[:, :, 0]) ** 2
        bd = bd + (pred[:, :, -1] - target[:, :, -1]) ** 2
        err_BD = jnp.mean(jnp.sqrt(bd / 2.0), axis=0)
    elif ndim_sp == 2:
        nx, ny = spatial
        bd_x = (pred[:, :, 0] - target[:, :, 0]) ** 2 + (pred[:, :, -1] - target[:, :, -1]) ** 2
        bd_y = (pred[:, :, :, 0] - target[:, :, :, 0]) ** 2 + (
            pred[:, :, :, -1] - target[:, :, :, -1]
        ) ** 2
        bd = (jnp.sum(bd_x, axis=-2) + jnp.sum(bd_y, axis=-2)) / (2 * nx + 2 * ny)
        err_BD = jnp.mean(jnp.sqrt(bd), axis=0)
    else:
        nx, ny, nz = spatial
        bd_x = (pred[:, :, 0] - target[:, :, 0]) ** 2 + (pred[:, :, -1] - target[:, :, -1]) ** 2
        bd_y = (pred[:, :, :, 0] - target[:, :, :, 0]) ** 2 + (
            pred[:, :, :, -1] - target[:, :, :, -1]
        ) ** 2
        bd_z = (pred[:, :, :, :, 0] - target[:, :, :, :, 0]) ** 2 + (
            pred[:, :, :, :, -1] - target[:, :, :, :, -1]
        ) ** 2
        bd = (
            jnp.sum(bd_x.reshape(nb, -1, nt), axis=-2)
            + jnp.sum(bd_y.reshape(nb, -1, nt), axis=-2)
            + jnp.sum(bd_z.reshape(nb, -1, nt), axis=-2)
        ) / (2 * nx * ny + 2 * ny * nz + 2 * nz * nx)
        # The 3D reference path (metrics.py:241-255) sums over channels and
        # returns per-batch sqrt; under if_mean this equals the batch mean, so
        # we take the batch mean here for a uniform (…, T) shape.
        err_BD = jnp.mean(jnp.sqrt(bd), axis=0)  # (T,)

    scale = {1: Lx, 2: Lx * Ly, 3: Lx * Ly * Lz}[ndim_sp]
    _err_F = _fourier_rmse(pred, target, scale)  # (C, nbins, T)
    err_F = jnp.stack(
        [
            jnp.mean(_err_F[:, :iLow], axis=1),
            jnp.mean(_err_F[:, iLow:iHigh], axis=1),
            jnp.mean(_err_F[:, iHigh:], axis=1),
        ],
        axis=1,
    )  # (C, 3, T)

    if if_mean:
        return (
            jnp.mean(err_RMSE),
            jnp.mean(err_nRMSE),
            jnp.mean(err_CSV),
            jnp.mean(err_Max),
            jnp.mean(err_BD),
            jnp.mean(err_F),
        )
    return err_RMSE, err_nRMSE, err_CSV, err_Max, err_BD, err_F


def nrmse_loss(output: jnp.ndarray, tar: jnp.ndarray) -> jnp.ndarray:
    """Training loss: per-sample nRMSE^2 (reference ``fno/train.py:34-40``).

    Mean of squared residual over dims (1,2,3), normalized by target power
    over the same dims.  Works for (B,X,Y,T,C) and (B,X,Y,Z,T,C).
    Returns the scalar mean.
    """
    dims = (1, 2, 3)
    residuals = output - tar
    tar_norm = 1e-7 + jnp.mean(tar**2, axis=dims, keepdims=True)
    raw = jnp.mean(residuals**2, axis=dims, keepdims=True) / tar_norm
    return jnp.mean(raw)


def lp_loss(x: jnp.ndarray, y: jnp.ndarray, p: int = 2, reduction: str = "mean", eps: float = 1e-20):
    """Relative Lp loss (reference ``metrics.py:531-552``)."""
    n = x.shape[0]
    diff = jnp.linalg.norm(x.reshape(n, -1) - y.reshape(n, -1), ord=p, axis=1)
    norm = eps + jnp.linalg.norm(y.reshape(n, -1), ord=p, axis=1)
    r = diff / norm
    if reduction == "mean":
        return jnp.mean(r)
    if reduction == "sum":
        return jnp.sum(r)
    return r


def _band_slice(xf: jnp.ndarray, flow: int | None, fhigh: int | None, ndims: int):
    flow = 0 if flow is None else flow
    fhigh = max(xf.shape[1:]) if fhigh is None else fhigh
    sl = (slice(None),) + (slice(flow, fhigh),) * ndims
    return xf[sl]


def fft_lp_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    flow: int | None = None,
    fhigh: int | None = None,
    p: int = 2,
    reduction: str = "mean",
    eps: float = 1e-20,
):
    """Band-limited relative Lp loss in Fourier space (reference ``metrics.py:556-602``)."""
    n = x.shape[0]
    dims = tuple(range(1, x.ndim))
    xf = jnp.fft.fftn(x, axes=dims)
    yf = jnp.fft.fftn(y, axes=dims)
    xf = _band_slice(xf, flow, fhigh, x.ndim - 1)
    yf = _band_slice(yf, flow, fhigh, x.ndim - 1)
    diff = jnp.linalg.norm((xf - yf).reshape(n, -1), ord=p, axis=1)
    norm = eps + jnp.linalg.norm(yf.reshape(n, -1), ord=p, axis=1)
    r = diff / norm
    if reduction == "mean":
        return jnp.mean(r)
    if reduction == "sum":
        return jnp.sum(r)
    return r


def fft_mse_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    flow: int | None = None,
    fhigh: int | None = None,
    reduction: str = "mean",
):
    """Band-limited MSE in Fourier space (reference ``metrics.py:606-650``).

    FFT over dims 1..ndim-2 (last dim is excluded, as reference).
    """
    n = x.shape[0]
    dims = tuple(range(1, x.ndim - 1))
    xf = jnp.fft.fftn(x, axes=dims)
    yf = jnp.fft.fftn(y, axes=dims)
    xf = _band_slice(xf, flow, fhigh, x.ndim - 2)
    yf = _band_slice(yf, flow, fhigh, x.ndim - 2)
    diff2 = jnp.abs((xf - yf).reshape(n, -1)) ** 2
    if reduction == "mean":
        return jnp.mean(diff2)
    if reduction == "sum":
        return jnp.sum(diff2)
    return diff2


def inverse_metrics(u0, x, pred_u0, y):
    """Inverse-problem metric dict (reference ``metrics.py:653-749``)."""
    out = {}
    out["mseloss_u0"] = float(jnp.mean((u0.reshape(1, -1) - x.reshape(1, -1)) ** 2))
    out["l2loss_u0"] = float(lp_loss(u0.reshape(1, -1), x.reshape(1, -1), p=2))
    out["l3loss_u0"] = float(lp_loss(u0.reshape(1, -1), x.reshape(1, -1), p=3))

    fmid = u0.shape[1] // 4
    bands = {"": (None, None), "_low": (0, fmid), "_mid": (fmid, 2 * fmid), "_hi": (2 * fmid, None)}
    for suf, (lo, hi) in bands.items():
        out[f"fftmseloss{suf}_u0"] = float(fft_mse_loss(u0, x, lo, hi))
        out[f"fftl2loss{suf}_u0"] = float(fft_lp_loss(u0, x, lo, hi, p=2))
        out[f"fftl3loss{suf}_u0"] = float(fft_lp_loss(u0, x, lo, hi, p=3))

    out["mseloss_pred_u0"] = float(jnp.mean((pred_u0.reshape(1, -1) - y.reshape(1, -1)) ** 2))
    out["l2loss_pred_u0"] = float(lp_loss(pred_u0.reshape(1, -1), y.reshape(1, -1), p=2))
    out["l3loss_pred_u0"] = float(lp_loss(pred_u0.reshape(1, -1), y.reshape(1, -1), p=3))

    fmid = pred_u0.shape[1] // 4
    pred_u0 = jnp.squeeze(pred_u0, -1)
    y = jnp.squeeze(y, -1)
    for suf, (lo, hi) in bands.items():
        out[f"fftmseloss{suf}_pred_u0"] = float(fft_mse_loss(pred_u0, y, lo, hi))
        out[f"fftl2loss{suf}_pred_u0"] = float(fft_lp_loss(pred_u0, y, lo, hi, p=2))
        out[f"fftl3loss{suf}_pred_u0"] = float(fft_lp_loss(pred_u0, y, lo, hi, p=3))
    return out
