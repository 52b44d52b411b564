"""3D VideoMAE-style transformer operator (buoyant-plume / ScalarFlow task).

Capability parity with the reference
(``pdebench/models/Transformer_3D_NS/Ours/transformer_3d_aux.py``):
  - ``PatchEmbed3D``: replicate-pad irregular spatial dims up to patch
    multiples, voxel tokens (t x y z) with feature order (tt px py pz c),
    Linear projection (reference :21-79);
  - encoder/decoder token stacks, biasless encoder_to_decoder, per-token
    voxel head, unpad, LAST frame (reference :442-482);
  - per-(T,X,Y,Z) instance normalization with stop-gradient + output
    de-normalization;
  - ``Transformer3DAux`` wrapper matching the FNO-aux call signature
    ``forward(x, grid, x_aux, grid_aux) -> (B,X,Y,Z,1,C)`` (reference
    :486-524; grids unused).

Our array convention is channels-last: x (B, T, X, Y, Z, C).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.models.common import instance_norm_stats
from sciml_pde_tpu.models.transformer import TokenStack, sinusoid_table, xavier


def _pad_to_multiple(x: jnp.ndarray, patch: Tuple[int, int, int]):
    """Replicate-pad spatial dims (axes 2,3,4 of (B,T,X,Y,Z,C))."""
    _, _, X, Y, Z, _ = x.shape
    gx = math.ceil(X / patch[0]) * patch[0]
    gy = math.ceil(Y / patch[1]) * patch[1]
    gz = math.ceil(Z / patch[2]) * patch[2]
    pads = (gx - X, gy - Y, gz - Z)
    if any(pads):
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (0, pads[0]), (0, pads[1]), (0, pads[2]), (0, 0)),
            mode="edge",
        )
    return x, pads


def patchify3d(x: jnp.ndarray, tubelet: int, patch: Tuple[int, int, int]):
    """(B, T, X, Y, Z, C) (already padded) -> (B, N, tt*px*py*pz*C)."""
    b, t, X, Y, Z, c = x.shape
    px, py, pz = patch
    x = x.reshape(b, t // tubelet, tubelet, X // px, px, Y // py, py, Z // pz, pz, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6, 8, 9)  # b t' x' y' z' tt px py pz c
    return x.reshape(b, -1, tubelet * px * py * pz * c)


def unpatchify3d(tokens, tubelet, patch, t, X, Y, Z, c):
    b = tokens.shape[0]
    px, py, pz = patch
    x = tokens.reshape(
        b, t // tubelet, X // px, Y // py, Z // pz, tubelet, px, py, pz, c
    )
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4, 8, 9)
    return x.reshape(b, t, X, Y, Z, c)


class VideoMAEOperator3D(nn.Module):
    """Next-frame operator on (B, T, X, Y, Z, C) -> (B, X, Y, Z, C)."""

    img_size: Tuple[int, int, int] = (50, 50, 89)
    patch_size: Tuple[int, int, int] = (10, 10, 9)
    tubelet_size: int = 5
    in_chans: int = 4
    num_frames: int = 10
    encoder_dim: int = 768
    encoder_depth: int = 12
    encoder_heads: int = 12
    decoder_dim: int = 512
    decoder_depth: int = 8
    decoder_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t, X, Y, Z, c = x.shape
        std, mean = instance_norm_stats(x, (1, 2, 3, 4))  # per (b, c)
        xn = (x - mean) / std

        xp, pads = _pad_to_multiple(xn, self.patch_size)
        Xp, Yp, Zp = xp.shape[2], xp.shape[3], xp.shape[4]
        tokens = nn.Dense(self.encoder_dim, kernel_init=xavier, name="patch_proj")(
            patchify3d(xp, self.tubelet_size, self.patch_size)
        )
        pos = jnp.asarray(sinusoid_table(tokens.shape[1], self.encoder_dim))
        tokens = tokens + pos[None]
        tokens = TokenStack(
            self.encoder_dim, self.encoder_depth, self.encoder_heads,
            self.mlp_ratio, self.qkv_bias, self.drop_path_rate, self.init_values,
            self.use_checkpoint, self.dtype, name="encoder",
        )(tokens, deterministic)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="encoder_norm")(tokens)
        tokens = nn.Dense(
            self.decoder_dim, use_bias=False, kernel_init=xavier, name="encoder_to_decoder"
        )(tokens)
        tokens = TokenStack(
            self.decoder_dim, self.decoder_depth, self.decoder_heads,
            self.mlp_ratio, self.qkv_bias, self.drop_path_rate, self.init_values,
            self.use_checkpoint, self.dtype, name="decoder",
        )(tokens, deterministic)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="decoder_norm")(tokens)
        out_dim = self.tubelet_size * int(np.prod(self.patch_size)) * c
        pix = nn.Dense(out_dim, kernel_init=xavier, name="head")(tokens).astype(jnp.float32)

        vol = unpatchify3d(pix, self.tubelet_size, self.patch_size, t, Xp, Yp, Zp, c)
        vol = vol[:, :, :X, :Y, :Z]  # unpad
        vol = vol * std + mean
        return vol[:, -1]  # (B, X, Y, Z, C)


class Transformer3DBaseline(nn.Module):
    """Single-stream wrapper with the FNO call signature
    (reference Transformer_3D_NS/Baseline): (x (B,X,Y,Z,T,C), grid) ->
    (B,X,Y,Z,1,C); grid unused."""

    core_kwargs: dict

    @nn.compact
    def __call__(self, x, grid):
        del grid
        core = VideoMAEOperator3D(**self.core_kwargs, name="vit_core")
        out = core(jnp.moveaxis(x, -2, 1))
        return out[..., None, :]


class Transformer3DAux(nn.Module):
    """FNO-aux-signature wrapper (reference transformer_3d_aux.py:486-524).

    Inputs are FNO-pipeline windows (B, X, Y, Z, T, C); grids are accepted
    but unused.  Returns ((B, X, Y, Z, 1, C), (B*nA, X, Y, Z, 1, C)).
    """

    core_kwargs: dict

    @nn.compact
    def __call__(self, x, grid, x_aux, grid_aux):
        del grid, grid_aux
        core = VideoMAEOperator3D(**self.core_kwargs, name="vit_core")
        b = x.shape[0]

        def to_tf(v):  # (B, X, Y, Z, T, C) -> (B, T, X, Y, Z, C)
            return jnp.moveaxis(v, -2, 1)

        xp, xa = to_tf(x), to_tf(x_aux)
        if xp.shape[1:] == xa.shape[1:]:
            out = core(jnp.concatenate([xp, xa], axis=0))
            out_p, out_a = out[:b], out[b:]
        else:
            out_p = core(xp)
            out_a = core(xa)
        return out_p[..., None, :], out_a[..., None, :]
