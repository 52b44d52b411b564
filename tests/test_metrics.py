"""metric_func / losses vs an independent numpy oracle.

The oracle re-implements the metric *definitions* (PDEBench's published
metric semantics, reference pdebench/models/metrics.py:164-306) with plain
python loops, independent of the vectorized JAX implementation under test.
"""

import math

import numpy as np
import pytest

from sciml_pde_tpu.metrics import metric_func, nrmse_loss, lp_loss, fft_lp_loss, fft_mse_loss


def oracle_metrics_2d(pred, target, iLow=4, iHigh=12, Lx=1.0, Ly=1.0):
    # pred/target: (B, X, Y, T, C) -> channel-first
    p = np.transpose(pred, (0, 4, 1, 2, 3)).astype(np.float64)
    t = np.transpose(target, (0, 4, 1, 2, 3)).astype(np.float64)
    nb, nc, nx, ny, nt = p.shape

    pf = p.reshape(nb, nc, -1, nt)
    tf = t.reshape(nb, nc, -1, nt)
    err_mean = np.sqrt(np.mean((pf - tf) ** 2, axis=2))
    rmse = np.mean(err_mean, axis=0)
    nrm = np.sqrt(np.mean(tf**2, axis=2))
    nrmse = np.mean(err_mean / nrm, axis=0)
    csv = np.sqrt(np.mean((pf.sum(2) - tf.sum(2)) ** 2, axis=0)) / (nx * ny)
    mx = np.max(np.abs(pf - tf), axis=(0, 2))

    bd_x = (p[:, :, 0] - t[:, :, 0]) ** 2 + (p[:, :, -1] - t[:, :, -1]) ** 2
    bd_y = (p[:, :, :, 0] - t[:, :, :, 0]) ** 2 + (p[:, :, :, -1] - t[:, :, :, -1]) ** 2
    bd = (bd_x.sum(-2) + bd_y.sum(-2)) / (2 * nx + 2 * ny)
    bd = np.mean(np.sqrt(bd), axis=0)

    pF = np.fft.fftn(p, axes=(2, 3))
    tF = np.fft.fftn(t, axes=(2, 3))
    e2 = np.abs(pF - tF) ** 2
    nbins = min(nx // 2, ny // 2)
    eF = np.zeros((nb, nc, nbins, nt))
    for i in range(nx // 2):
        for j in range(ny // 2):
            it = math.floor(math.sqrt(i**2 + j**2))
            if it > nbins - 1:
                continue
            eF[:, :, it] += e2[:, :, i, j]
    _eF = np.sqrt(np.mean(eF, axis=0)) / (nx * ny) * Lx * Ly
    errF = np.stack(
        [
            np.mean(_eF[:, :iLow], axis=1),
            np.mean(_eF[:, iLow:iHigh], axis=1),
            np.mean(_eF[:, iHigh:], axis=1),
        ],
        axis=1,
    )
    return tuple(np.mean(v) for v in (rmse, nrmse, csv, mx, bd, errF))


@pytest.mark.parametrize("shape", [(3, 16, 16, 4, 2), (2, 32, 16, 3, 1)])
def test_metric_func_matches_oracle_2d(shape):
    rng = np.random.default_rng(0)
    pred = rng.normal(size=shape).astype(np.float32)
    target = pred + 0.1 * rng.normal(size=shape).astype(np.float32)
    got = metric_func(pred, target, if_mean=True, iLow=2, iHigh=6)
    want = oracle_metrics_2d(pred, target, iLow=2, iHigh=6)
    for g, w, name in zip(got, want, ["RMSE", "nRMSE", "CSV", "Max", "BD", "F"]):
        np.testing.assert_allclose(float(g), float(w), rtol=2e-4, err_msg=name)


def test_metric_func_3d_shapes():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(2, 8, 8, 8, 3, 2)).astype(np.float32)
    target = rng.normal(size=(2, 8, 8, 8, 3, 2)).astype(np.float32)
    out = metric_func(pred, target, if_mean=True, iLow=1, iHigh=3)
    assert len(out) == 6
    for v in out:
        assert np.isfinite(float(v))


def test_nrmse_loss_perfect_prediction_zero():
    rng = np.random.default_rng(2)
    y = rng.normal(size=(4, 8, 8, 1, 2)).astype(np.float32)
    assert float(nrmse_loss(y, y)) == 0.0
    # scale invariance of the normalized form: residual/target both scaled
    x = y * 1.5
    a = float(nrmse_loss(x, y))
    b = float(nrmse_loss(10 * x, 10 * y))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_lp_loss_against_definition():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 17)).astype(np.float32)
    y = rng.normal(size=(5, 17)).astype(np.float32)
    want = np.mean(
        np.linalg.norm(x - y, axis=1) / (1e-20 + np.linalg.norm(y, axis=1))
    )
    np.testing.assert_allclose(float(lp_loss(x, y, p=2)), want, rtol=1e-5)


def test_fft_losses_finite():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16, 16)).astype(np.float32)
    y = rng.normal(size=(2, 16, 16)).astype(np.float32)
    assert np.isfinite(float(fft_lp_loss(x, y, flow=0, fhigh=8)))
    x3 = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    y3 = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    assert np.isfinite(float(fft_mse_loss(x3, y3, flow=2, fhigh=6)))
