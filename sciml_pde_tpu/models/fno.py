"""Fourier Neural Operators (2D/3D), baseline and two-head auxiliary variants.

Capability parity with the reference:
  - ``FNO2d``/``FNO3d`` baseline: ``pdebench/models/fno/fno.py:95-188,291-390``
  - two-head aux variants (``fc2_primary``/``fc2_auxiliary`` over a shared
    backbone): ``pdebench/models/fno_aux/fno_aux.py:115-222,374-475``.

TPU-first design:
  - channels-last throughout (no NCHW permutes around the FFT);
  - the aux variant runs the backbone ONCE over the concatenated
    primary+auxiliary batch (the reference runs the four spectral layers
    twice, fno_aux.py:164-220) and applies the two heads to the static batch
    split — one jitted program, better MXU utilisation;
  - per-sample instance norm with stop_gradient inside the forward, matching
    the reference's ``torch.no_grad`` std/mean + de-norm of the output.

Call signatures (shapes as emitted by the data pipeline):
  FNO2d:    (x: [B,X,Y,T,C], grid: [B,X,Y,2])            -> [B,X,Y,1,C]
  FNO3d:    (x: [B,X,Y,Z,T,C], grid: [B,X,Y,Z,3])        -> [B,X,Y,Z,1,C]
  FNO2dAux: (x, grid, x_aux: [B*nA,X,Y,T,C], grid_aux)   -> (prim, aux)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sciml_pde_tpu.models.common import TorchDense, gelu, instance_norm_stats
from sciml_pde_tpu.ops.spectral import (
    spectral_conv_2d,
    spectral_conv_3d,
    spectral_weight_init,
)


class SpectralConv2d(nn.Module):
    out_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w1 = self.param(
            "w1", spectral_weight_init, cin, self.out_channels, self.modes1, self.modes2
        )
        w2 = self.param(
            "w2", spectral_weight_init, cin, self.out_channels, self.modes1, self.modes2
        )
        return spectral_conv_2d(x, w1, w2, self.modes1, self.modes2)


class SpectralConv3d(nn.Module):
    out_channels: int
    modes1: int
    modes2: int
    modes3: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        ws = [
            self.param(
                f"w{i+1}",
                spectral_weight_init,
                cin,
                self.out_channels,
                self.modes1,
                self.modes2,
                self.modes3,
            )
            for i in range(4)
        ]
        return spectral_conv_3d(x, *ws, self.modes1, self.modes2, self.modes3)


class FNOBackbone2d(nn.Module):
    """Lift -> pad -> 4x(spectral + pointwise) -> unpad -> project to 128.

    These are exactly the reference's ``shared_layers``
    (fno_aux.py:118-121): fc0, conv0..3, w0..3, fc1.
    """

    modes1: int
    modes2: int
    width: int
    padding: int = 2
    remat: bool = False  # rematerialize each spectral block on backward
    # (at 256^2 production shapes the four blocks' saved activations plus
    # the fc1 projection dominate HLO temps next to a device-resident store)

    @nn.compact
    def __call__(self, x):
        # x: (B, X, Y, F) already flattened time*chan + grid features
        nx, ny = x.shape[1], x.shape[2]
        x = TorchDense(self.width, name="fc0")(x)
        x = jnp.pad(x, ((0, 0), (0, self.padding), (0, self.padding), (0, 0)))
        for i in range(4):
            def block(mdl, h, _i=i):
                h1 = SpectralConv2d(
                    mdl.width, mdl.modes1, mdl.modes2, name=f"conv{_i}"
                )(h)
                h2 = TorchDense(mdl.width, name=f"w{_i}")(h)
                h = h1 + h2
                return gelu(h) if _i < 3 else h

            # nn.remat on a (module, x) function keeps param paths identical
            # to the inline body, so checkpoints are interchangeable
            x = (nn.remat(block)(self, x) if self.remat else block(self, x))
        x = x[:, :nx, :ny]
        return gelu(TorchDense(128, name="fc1")(x))


class FNOBackbone3d(nn.Module):
    modes1: int
    modes2: int
    modes3: int
    width: int
    padding: int = 6  # z-only padding, reference fno.py:314,360
    remat: bool = False  # rematerialize each spectral block on backward
    # (3D activations are (B, X, Y, Z+pad, W) — at production plume shape
    # the four blocks' saved activations dominate HBM temps)

    @nn.compact
    def __call__(self, x):
        nz = x.shape[3]
        x = TorchDense(self.width, name="fc0")(x)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, self.padding), (0, 0)))
        for i in range(4):
            def block(mdl, h, _i=i):
                h1 = SpectralConv3d(
                    mdl.width, mdl.modes1, mdl.modes2, mdl.modes3, name=f"conv{_i}"
                )(h)
                h2 = TorchDense(mdl.width, name=f"w{_i}")(h)
                h = h1 + h2
                return gelu(h) if _i < 3 else h

            # nn.remat on a (module, x) function keeps param paths identical
            # to the inline body, so checkpoints are interchangeable
            x = (nn.remat(block)(self, x) if self.remat else block(self, x))
        x = x[:, :, :, :nz]
        return gelu(TorchDense(128, name="fc1")(x))


def _prep_2d(x, grid):
    """Normalize per sample/channel over (X,Y,T) and build lifted input."""
    std, mean = instance_norm_stats(x, (1, 2, 3))
    xn = (x - mean) / std
    b, nx, ny = xn.shape[:3]
    inp = xn.reshape(b, nx, ny, -1)
    return jnp.concatenate([inp, grid], axis=-1), std, mean


def _prep_3d(x, grid):
    std, mean = instance_norm_stats(x, (1, 2, 3, 4))
    xn = (x - mean) / std
    b, nx, ny, nz = xn.shape[:4]
    inp = xn.reshape(b, nx, ny, nz, -1)
    return jnp.concatenate([inp, grid], axis=-1), std, mean


def _denorm(out, std, mean):
    """out: (B, *spatial, C); std/mean: (B, 1...1, 1, C) -> re-insert t dim."""
    out = out * jnp.squeeze(std, -2) + jnp.squeeze(mean, -2)
    return out[..., None, :]  # (B, *spatial, 1, C)


class FNO2d(nn.Module):
    """Baseline 2D FNO (reference fno.py:95-188)."""

    num_channels: int
    modes1: int = 12
    modes2: int = 12
    width: int = 20
    initial_step: int = 10
    remat: bool = False

    @nn.compact
    def __call__(self, x, grid):
        inp, std, mean = _prep_2d(x, grid)
        feats = FNOBackbone2d(self.modes1, self.modes2, self.width,
                              remat=self.remat, name="backbone")(inp)
        out = TorchDense(self.num_channels, name="fc2")(feats)
        return _denorm(out, std, mean)


class FNO3d(nn.Module):
    """Baseline 3D FNO (reference fno.py:291-390)."""

    num_channels: int
    modes1: int = 8
    modes2: int = 8
    modes3: int = 8
    width: int = 20
    initial_step: int = 10
    remat: bool = False

    @nn.compact
    def __call__(self, x, grid):
        inp, std, mean = _prep_3d(x, grid)
        feats = FNOBackbone3d(self.modes1, self.modes2, self.modes3, self.width,
                              remat=self.remat, name="backbone")(
            inp
        )
        out = TorchDense(self.num_channels, name="fc2")(feats)
        return _denorm(out, std, mean)


class FNO2dAux(nn.Module):
    """Two-head 2D FNO for multiphysics joint training (fno_aux.py:69-222).

    The backbone is shared; ``fc2_primary``/``fc2_auxiliary`` are separate
    heads.  Both streams are normalized independently (instance norm is
    per-sample, so concatenating the batches preserves that), the backbone
    runs once over the concatenated batch, and the heads are applied to the
    static batch split.

    ``primary``/``auxiliary`` expose the two streams as separate methods
    (identical math — instance norm is per-sample) so the train step can
    scan the auxiliary stream in chunks when the aux batch is large
    (reference ``num_aux_samples: 24`` = 8 primary + 192 aux windows per
    step at 256^2, config_ns.yaml:19,31 — far past one chip's HLO-temp
    budget in a single concatenated pass).  Setup-style module: param
    paths (``backbone``/``fc2_primary``/``fc2_auxiliary``) are unchanged,
    so checkpoints are interchangeable with the compact variant.
    """

    num_channels: int
    modes1: int = 12
    modes2: int = 12
    width: int = 20
    initial_step: int = 10
    remat: bool = False

    def setup(self):
        self.backbone = FNOBackbone2d(self.modes1, self.modes2, self.width,
                                      remat=self.remat)
        self.fc2_primary = TorchDense(self.num_channels)
        self.fc2_auxiliary = TorchDense(self.num_channels)

    def primary(self, x, grid):
        inp, std, mean = _prep_2d(x, grid)
        return _denorm(self.fc2_primary(self.backbone(inp)), std, mean)

    def auxiliary(self, x_aux, grid_aux):
        inp, std, mean = _prep_2d(x_aux, grid_aux)
        return _denorm(self.fc2_auxiliary(self.backbone(inp)), std, mean)

    def __call__(self, x, grid, x_aux, grid_aux):
        b = x.shape[0]
        inp_p, std_p, mean_p = _prep_2d(x, grid)
        inp_a, std_a, mean_a = _prep_2d(x_aux, grid_aux)
        inp = jnp.concatenate([inp_p, inp_a], axis=0)
        feats = self.backbone(inp)
        out_p = self.fc2_primary(feats[:b])
        out_a = self.fc2_auxiliary(feats[b:])
        return _denorm(out_p, std_p, mean_p), _denorm(out_a, std_a, mean_a)


class FNO3dAux(nn.Module):
    """Two-head 3D FNO (fno_aux.py:325-475)."""

    num_channels: int
    modes1: int = 8
    modes2: int = 8
    modes3: int = 8
    width: int = 20
    initial_step: int = 10
    remat: bool = False

    def setup(self):
        self.backbone = FNOBackbone3d(self.modes1, self.modes2, self.modes3,
                                      self.width, remat=self.remat)
        self.fc2_primary = TorchDense(self.num_channels)
        self.fc2_auxiliary = TorchDense(self.num_channels)

    def primary(self, x, grid):
        inp, std, mean = _prep_3d(x, grid)
        return _denorm(self.fc2_primary(self.backbone(inp)), std, mean)

    def auxiliary(self, x_aux, grid_aux):
        inp, std, mean = _prep_3d(x_aux, grid_aux)
        return _denorm(self.fc2_auxiliary(self.backbone(inp)), std, mean)

    def __call__(self, x, grid, x_aux, grid_aux):
        b = x.shape[0]
        inp_p, std_p, mean_p = _prep_3d(x, grid)
        inp_a, std_a, mean_a = _prep_3d(x_aux, grid_aux)
        inp = jnp.concatenate([inp_p, inp_a], axis=0)
        feats = self.backbone(inp)
        out_p = self.fc2_primary(feats[:b])
        out_a = self.fc2_auxiliary(feats[b:])
        return _denorm(out_p, std_p, mean_p), _denorm(out_a, std_a, mean_a)


SHARED_PARAM_PREFIXES: Sequence[str] = ("backbone",)
PRIMARY_HEAD_PREFIX = "fc2_primary"
AUX_HEAD_PREFIX = "fc2_auxiliary"
