"""OFormer (operator transformer) comparison suite.

Capability parity with the third-party baseline vendored by the reference
(``OFormer Model Comparison/nn_module/``):
  - ``LinearAttention`` with Galerkin (instance-norm K, V) and Fourier
    (instance-norm Q, K) normalization schemes and the linear
    q (k^T v) / n contraction (attention_module.py:155-311);
  - rotary and 2D-rotary relative position embeddings
    (attention_module.py:80-115);
  - ``CrossLinearAttention`` decoder attention (attention_module.py:311+);
  - ``SpatialTemporalEncoder2D``: Linear embed -> Galerkin transformer with
    per-layer rotary scales -> Linear to latent (encoder_module.py:1135-1172);
  - ``PointWiseDecoder2D``: Gaussian Fourier coordinate features -> cross
    attention -> latent ``propagate`` blocks -> pointwise decode of
    ``out_steps`` frames, plus latent ``rollout``
    (decoder_module.py:670-767).

All linear-attention contractions are plain matmuls — already the ideal MXU
form; the O(n) memory of Galerkin attention needs no custom kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ortho = nn.initializers.orthogonal()
xavier = nn.initializers.xavier_uniform()


# --------------------------------------------------------------------------
# rotary embeddings
# --------------------------------------------------------------------------


def rotary_freqs(coords: jnp.ndarray, dim: int, min_freq: float = 1 / 64, scale: float = 1.0):
    """coords (..., n) -> (..., n, dim) rotary phase table."""
    inv = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = coords * (scale / min_freq)
    freqs = t[..., None] * jnp.asarray(inv)
    return jnp.concatenate([freqs, freqs], axis=-1)


def _rotate_half(x):
    x1, x2 = jnp.split(x.reshape(x.shape[:-1] + (2, x.shape[-1] // 2)), 2, axis=-2)
    return jnp.concatenate([-x2, x1], axis=-1).reshape(x.shape[:-1] + (x.shape[-1],))


def apply_rotary_pos_emb(t, freqs):
    return t * jnp.cos(freqs) + _rotate_half(t) * jnp.sin(freqs)


def apply_2d_rotary_pos_emb(t, fx, fy):
    d = t.shape[-1]
    tx, ty = t[..., : d // 2], t[..., d // 2 :]
    return jnp.concatenate(
        [apply_rotary_pos_emb(tx, fx), apply_rotary_pos_emb(ty, fy)], axis=-1
    )


def _instance_norm(x, eps=1e-5):
    """Standardize the last (head) dim per token — matches the reference's
    affine-free InstanceNorm1d usage (attention_module.py:257-261)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


# --------------------------------------------------------------------------
# attention
# --------------------------------------------------------------------------


class LinearAttention(nn.Module):
    dim: int
    attn_type: str = "galerkin"  # galerkin | fourier
    heads: int = 8
    dim_head: int = 64
    relative_emb: bool = True
    scale: float = 1.0
    relative_emb_dim: int = 2
    min_freq: float = 1 / 64

    @nn.compact
    def __call__(self, x, pos=None, mask=None):
        # mask: optional (b, n) bool — padded rows excluded from the
        # Galerkin contraction (reference TransformerWithPad,
        # BVP/nn_module/encoder_module.py:719-781)
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=ortho, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_of(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        if self.attn_type == "galerkin":
            k, v = _instance_norm(k), _instance_norm(v)
        else:  # fourier
            q, k = _instance_norm(q), _instance_norm(k)

        if self.relative_emb:
            if self.relative_emb_dim == 2:
                fx = rotary_freqs(pos[..., 0], self.dim_head // 2, self.min_freq, self.scale)
                fy = rotary_freqs(pos[..., 1], self.dim_head // 2, self.min_freq, self.scale)
                fx, fy = fx[:, None], fy[:, None]
                q = apply_2d_rotary_pos_emb(q, fx, fy)
                k = apply_2d_rotary_pos_emb(k, fx, fy)
            else:
                f = rotary_freqs(pos[..., 0], self.dim_head, self.min_freq, self.scale)[:, None]
                q = apply_rotary_pos_emb(q, f)
                k = apply_rotary_pos_emb(k, f)

        # linear (Galerkin) contraction: q (k^T v) / n
        if mask is not None:
            m = mask[:, None, :, None]
            k = jnp.where(m, k, 0.0)
            v = jnp.where(m, v, 0.0)
            denom = jnp.sum(mask, axis=1).astype(x.dtype)[:, None, None, None]
            denom = jnp.maximum(denom, 1.0)
        else:
            denom = n
        dots = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, dots) / denom
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, kernel_init=xavier, name="to_out")(out)


class CrossLinearAttention(nn.Module):
    """Queries from x (target points), keys/values from context z."""

    dim: int
    attn_type: str = "galerkin"
    heads: int = 8
    dim_head: int = 64
    relative_emb: bool = True
    scale: float = 16.0
    relative_emb_dim: int = 2
    min_freq: float = 1 / 64

    @nn.compact
    def __call__(self, x, z, x_pos=None, z_pos=None, mask=None):
        # mask: optional (b, m) bool over the context rows (reference
        # CrossFormerWithPad, BVP/nn_module/decoder_module.py:1283-1320)
        b, n, _ = x.shape
        m = z.shape[1]
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, kernel_init=ortho, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, kernel_init=ortho, name="to_kv")(z)
        k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k, v = _instance_norm(k), _instance_norm(v)

        if self.relative_emb and x_pos is not None:
            fqx = rotary_freqs(x_pos[..., 0], self.dim_head // 2, self.min_freq, self.scale)[:, None]
            fqy = rotary_freqs(x_pos[..., 1], self.dim_head // 2, self.min_freq, self.scale)[:, None]
            fkx = rotary_freqs(z_pos[..., 0], self.dim_head // 2, self.min_freq, self.scale)[:, None]
            fky = rotary_freqs(z_pos[..., 1], self.dim_head // 2, self.min_freq, self.scale)[:, None]
            q = apply_2d_rotary_pos_emb(q, fqx, fqy)
            k = apply_2d_rotary_pos_emb(k, fkx, fky)

        if mask is not None:
            mm = mask[:, None, :, None]
            k = jnp.where(mm, k, 0.0)
            v = jnp.where(mm, v, 0.0)
            denom = jnp.sum(mask, axis=1).astype(x.dtype)[:, None, None, None]
            denom = jnp.maximum(denom, 1.0)
        else:
            denom = m
        dots = jnp.einsum("bhmd,bhme->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, dots) / denom
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, kernel_init=xavier, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=xavier, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, kernel_init=xavier, name="fc2")(x)


class GalerkinTransformer(nn.Module):
    """TransformerCatNoCls (encoder_module.py:458-530): depth layers of
    (LayerNorm -> LinearAttention(+rotary, per-layer scale) -> residual,
    LayerNorm -> FFN -> residual)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    attn_type: str = "galerkin"
    scales: Sequence[float] = (32, 16, 16, 1)
    min_freq: float = 1 / 64
    relative_emb_dim: int = 2

    @nn.compact
    def __call__(self, x, pos, mask=None):
        scales = list(self.scales)
        assert len(scales) == self.depth
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"ln_attn{i}")(x)
            x = x + LinearAttention(
                self.dim, self.attn_type, self.heads, self.dim_head,
                relative_emb=True, scale=float(scales[i]), min_freq=self.min_freq,
                relative_emb_dim=self.relative_emb_dim,
                name=f"attn{i}",
            )(h, pos, mask=mask)
            h = nn.LayerNorm(name=f"ln_ffn{i}")(x)
            x = x + FeedForward(self.dim, self.mlp_dim, name=f"ffn{i}")(h)
            if mask is not None:
                x = jnp.where(mask[..., None], x, 0.0)
        return x


class SpatialTemporalEncoder2D(nn.Module):
    """encoder_module.py:1135-1172."""

    input_channels: int
    in_emb_dim: int = 128
    out_seq_emb_dim: int = 128
    heads: int = 4
    depth: int = 4

    @nn.compact
    def __call__(self, x, input_pos):
        # x: (b, n, input_channels); input_pos: (b, n, 2)
        x = nn.Dense(self.in_emb_dim, use_bias=False, kernel_init=xavier, name="to_embedding")(x)
        scales = [32] + [16] * (self.depth - 2) + [1] if self.depth <= 4 else (
            [32, 16, 8, 8] + [1] * (self.depth - 4)
        )
        scales = scales[: self.depth] if self.depth > 1 else [1]
        x = GalerkinTransformer(
            self.in_emb_dim, self.depth, self.heads, self.in_emb_dim,
            self.in_emb_dim, scales=tuple(scales), name="s_transformer",
        )(x, input_pos)
        return nn.Dense(
            self.out_seq_emb_dim, use_bias=False, kernel_init=xavier, name="project_to_latent"
        )(x)


class GaussianFourierFeatureTransform(nn.Module):
    """Random Fourier features of coordinates (decoder_module.py:201)."""

    mapping_size: int
    scale: float = 8.0

    @nn.compact
    def __call__(self, pos):
        b_mat = self.param(
            "B",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (pos.shape[-1], self.mapping_size),
        )
        proj = 2 * jnp.pi * pos @ jax.lax.stop_gradient(b_mat)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class PointWiseDecoder2D(nn.Module):
    """decoder_module.py:670-767."""

    latent_channels: int = 128
    out_channels: int = 2
    out_steps: int = 1
    propagator_depth: int = 2
    scale: float = 8.0
    remat: bool = False

    def setup(self):
        lc = self.latent_channels
        self.coord_ff = GaussianFourierFeatureTransform(lc // 2, self.scale)
        self.coord_fc1 = nn.Dense(lc, use_bias=False, kernel_init=xavier)
        self.coord_fc2 = nn.Dense(lc // 2, use_bias=False, kernel_init=xavier)
        self.decoding_transformer = CrossLinearAttention(
            lc // 2, "galerkin", heads=4, dim_head=lc // 2, scale=16.0
        )
        self.expand_feat = nn.Dense(lc, kernel_init=xavier)
        self.prop_ln = [nn.LayerNorm() for _ in range(self.propagator_depth)]
        self.prop_mlp = [
            [
                nn.Dense(lc, use_bias=False, kernel_init=xavier),
                nn.Dense(lc, use_bias=False, kernel_init=xavier),
                nn.Dense(lc, use_bias=False, kernel_init=xavier),
            ]
            for _ in range(self.propagator_depth)
        ]
        self.out_ln = nn.LayerNorm()
        self.out_fc1 = nn.Dense(lc // 2, use_bias=False, kernel_init=xavier)
        self.out_fc2 = nn.Dense(lc // 2, use_bias=False, kernel_init=xavier)
        self.out_fc3 = nn.Dense(self.out_channels * self.out_steps, kernel_init=xavier)

    def get_embedding(self, z, propagate_pos, input_pos):
        x = self.coord_ff(propagate_pos)
        x = self.coord_fc1(x)
        x = nn.gelu(x, approximate=False)
        x = self.coord_fc2(x)
        z = self.decoding_transformer(x, z, propagate_pos, input_pos)
        return self.expand_feat(z)

    def propagate(self, z, pos):
        for ln, (fc1, fc2, fc3) in zip(self.prop_ln, self.prop_mlp):
            h = jnp.concatenate([ln(z), pos], axis=-1)
            h = nn.gelu(fc1(h), approximate=False)
            h = nn.gelu(fc2(h), approximate=False)
            z = fc3(h) + z
        return z

    def decode(self, z):
        h = self.out_ln(z)
        h = nn.gelu(self.out_fc1(h), approximate=False)
        h = nn.gelu(self.out_fc2(h), approximate=False)
        return self.out_fc3(h)

    def __call__(self, z, propagate_pos, input_pos):
        """One decode step: latent z (b, m, c) -> u (b, n, out_steps*C)."""
        z = self.get_embedding(z, propagate_pos, input_pos)
        z = self.propagate(z, propagate_pos)
        return self.decode(z), z

    def rollout(self, z, propagate_pos, forward_steps, input_pos):
        """Latent-space rollout (decoder_module.py:749-767): propagate the
        latent ``forward_steps // out_steps`` times, decoding each chunk.

        ``remat`` recomputes each propagate/decode step in the backward
        pass so long training rollouts (e.g. the 40-step DR protocol)
        don't hold every step's activations in HBM."""
        z = self.get_embedding(z, propagate_pos, input_pos)

        def body(zc, _):
            zc = self.propagate(zc, propagate_pos)
            return zc, self.decode(zc)

        if self.remat:
            body = jax.checkpoint(body)
        _, frames = jax.lax.scan(body, z, None, length=forward_steps // self.out_steps)
        # frames: (steps, b, n, out_steps*C) -> (b, n, steps*out_steps*C)
        frames = jnp.moveaxis(frames, 0, 2)
        b, n = frames.shape[0], frames.shape[1]
        return frames.reshape(b, n, -1)


class OFormer2D(nn.Module):
    """Encoder + pointwise decoder, one next-step prediction on a grid.

    __call__(x (B, N, C_in), pos (B, N, 2)) -> (B, N, out_channels*out_steps)
    """

    input_channels: int
    out_channels: int
    in_emb_dim: int = 128
    latent_channels: int = 128
    heads: int = 4
    depth: int = 4
    out_steps: int = 1
    propagator_depth: int = 2
    remat: bool = False

    def setup(self):
        self.encoder = SpatialTemporalEncoder2D(
            self.input_channels, self.in_emb_dim, self.latent_channels,
            self.heads, self.depth,
        )
        self.decoder = PointWiseDecoder2D(
            self.latent_channels, self.out_channels, self.out_steps,
            self.propagator_depth, remat=self.remat,
        )

    def __call__(self, x, pos):
        z = self.encoder(x, pos)
        u, _ = self.decoder(z, pos, pos)
        return u

    def rollout(self, x, pos, forward_steps):
        z = self.encoder(x, pos)
        return self.decoder.rollout(z, pos, forward_steps, pos)


class OFormer1D(nn.Module):
    """1D variant for Burgers / Darcy-style problems (the vendored suite's
    ``train_burgers.py``/``train_darcy.py`` models use the same encoder and
    a pointwise decoder with 1D rotary embeddings).

    __call__(x (B, N, C_in), pos (B, N, 1)) -> (B, N, out_channels*out_steps)
    """

    input_channels: int
    out_channels: int
    in_emb_dim: int = 96
    latent_channels: int = 96
    heads: int = 4
    depth: int = 4
    out_steps: int = 1

    @nn.compact
    def __call__(self, x, pos):
        h = nn.Dense(self.in_emb_dim, use_bias=False, kernel_init=xavier,
                     name="to_embedding")(x)
        scales = [32] + [16] * (self.depth - 2) + [1]
        h = GalerkinTransformer(
            self.in_emb_dim, self.depth, self.heads, self.in_emb_dim,
            self.in_emb_dim, scales=tuple(scales), relative_emb_dim=1,
            name="s_transformer",
        )(h, pos)
        z = nn.Dense(self.latent_channels, use_bias=False, kernel_init=xavier,
                     name="project_to_latent")(h)
        z = nn.LayerNorm(name="out_ln")(z)
        z = nn.gelu(
            nn.Dense(self.latent_channels, use_bias=False, kernel_init=xavier,
                     name="out_fc1")(z),
            approximate=False,
        )
        return nn.Dense(self.out_channels * self.out_steps, kernel_init=xavier,
                        name="out_fc2")(z)


class OFormerIrreg2D(nn.Module):
    """Steady-state operator on irregular point clouds with padding.

    Capability parity with the vendored BVP suite's
    ``IrregSpatialEncoder2D`` (BVP/nn_module/encoder_module.py:719-781)
    + ``IrregSpatialDecoder2D`` (decoder_module.py:1283-1380): variable-
    size scattered node sets arrive zero-padded with a boolean pad mask;
    the encoder embeds node features and runs pad-aware Galerkin
    attention; the decoder projects (x, y, boundary-flag) coordinates,
    cross-attends into the encoded context, mixes, and emits a scalar
    (potential) head and a 2-vector (field) head.  Covers the electro/
    magneto BVP and steady airfoil cases; time-dependent point sets
    flatten their window into the feature channels (the reference's
    IrregSTEncoder2D combines frames the same way before attention).

    __call__(x (B,N,C), pos (B,N,2), pad_mask (B,N) bool,
             bound_mask (B,N) bool) -> (scalar (B,N,1), field (B,N,2))
    """

    input_channels: int
    latent_channels: int = 64
    heads: int = 1
    depth: int = 2
    res: int = 50

    @nn.compact
    def __call__(self, x, pos, pad_mask, bound_mask):
        lc = self.latent_channels
        mask_f = pad_mask[..., None]

        # ---- encoder --------------------------------------------------
        h = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="emb_fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="emb_fc2")(h)
        h = jnp.where(mask_f, h, 0.0)
        scales = [self.res, self.res // 4] + [1] * max(self.depth - 2, 0)
        h = GalerkinTransformer(
            lc, self.depth, self.heads, lc, lc,
            scales=tuple(scales[: self.depth]), min_freq=1 / self.res,
            name="s_transformer",
        )(h, pos, mask=pad_mask)
        h = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="enc_out_fc1")(h)
        h = nn.relu(h)
        z = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="enc_out_fc2")(h)
        z = jnp.where(mask_f, z, 0.0)

        # ---- decoder --------------------------------------------------
        coords = jnp.concatenate([pos, bound_mask[..., None].astype(x.dtype)], -1)
        c = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="coord_fc1")(coords)
        c = nn.gelu(c, approximate=False)
        c = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="coord_fc2")(c)
        c = nn.gelu(c, approximate=False)
        c = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="coord_fc3")(c)

        d = c + CrossLinearAttention(
            lc, "galerkin", heads=4, dim_head=lc, scale=1.0,
            min_freq=1 / self.res, name="decoding_xattn",
        )(c, z, pos, pos, mask=pad_mask)
        d = d + LinearAttention(
            lc, "galerkin", heads=1, dim_head=lc, scale=4.0,
            min_freq=1 / self.res, name="mix_attn",
        )(d, pos, mask=pad_mask)

        d = jnp.concatenate([d, bound_mask[..., None].astype(x.dtype)], -1)
        d = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="dec_out_fc1")(d)
        d = nn.relu(d)
        d = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="dec_out_fc2")(d)

        def head(t, width, name):
            t = nn.Dense(lc, use_bias=False, kernel_init=xavier, name=f"{name}_fc1")(t)
            t = nn.relu(t)
            return nn.Dense(width, kernel_init=xavier, name=f"{name}_fc2")(t)

        scalar = jnp.where(mask_f, head(d, 1, "scalar_head"), 0.0)
        field = jnp.where(mask_f, head(d, 2, "field_head"), 0.0)
        return scalar, field


class OFormerIrregST2D(nn.Module):
    """Time-dependent operator on irregular point clouds (airfoil class).

    Capability parity with the vendored airfoil suite's
    ``IrregSTEncoder2D`` (BVP/nn_module/encoder_module.py:783-855) +
    ``IrregSTDecoder2D`` (airfoil/nn_module/decoder_module.py:1395-1500):
    a ``time_window`` of frames on a scattered mesh is collapsed by a
    strided temporal conv stack, node-type embeddings are added (interior
    / boundary / obstacle), a Galerkin transformer encodes space, and the
    decoder rolls the dynamics ``forward_steps`` times in latent space,
    decoding each step — the mesh never needs to be a grid.

    __call__(x (B,T,N,C), node_type (B,N) int, pos (B,N,2),
             forward_steps, pad_mask=None) -> (B, forward_steps, N, out)
    """

    input_channels: int
    out_channels: int
    time_window: int = 4
    max_node_type: int = 3
    emb_dim: int = 64
    latent_channels: int = 64
    heads: int = 1
    depth: int = 2
    res: int = 200
    ff_scale: float = 8.0

    @nn.compact
    def __call__(self, x, node_type, pos, forward_steps: int, pad_mask=None):
        b, t, n, _ = x.shape
        lc = self.latent_channels

        # ---- temporal collapse (conv (3,) s2 -> (tw/2,) s tw/2 -> 1x1) --
        h = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * n, t, x.shape[-1])
        h = nn.Conv(self.emb_dim, (3,), strides=(2,), padding=[(1, 1)],
                    use_bias=False, name="t_conv1")(h)
        h = nn.gelu(h, approximate=False)
        half = max(self.time_window // 2, 1)
        h = nn.Conv(self.emb_dim, (half,), strides=(half,), padding="VALID",
                    use_bias=False, name="t_conv2")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(self.emb_dim, (1,), use_bias=False, name="t_conv3")(h)
        h = h.reshape(b, n, -1, self.emb_dim)[:, :, 0]  # (b, n, emb)

        # ---- node-type embedding + spatial transformer ------------------
        h = h + nn.Embed(self.max_node_type, self.emb_dim, name="node_emb")(node_type)
        h = nn.Dense(self.emb_dim, use_bias=False, kernel_init=xavier,
                     name="combine")(h)
        h_skip = h
        scales = ([32, 16, 8, 8] + [1] * (self.depth - 4)) if self.depth > 4 else (
            [32] + [16] * max(self.depth - 2, 0) + [1]
        )
        h = GalerkinTransformer(
            self.emb_dim, self.depth, self.heads, self.emb_dim, self.emb_dim,
            scales=tuple(scales[: self.depth]), min_freq=1 / self.res,
            name="s_transformer",
        )(h, pos, mask=pad_mask)
        h = nn.LayerNorm(name="enc_ln")(h + h_skip)
        z = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="enc_out")(h)

        # ---- decoder: coordinate/node query + latent rollout ------------
        z_node = nn.Embed(self.max_node_type, lc, name="dec_node_emb")(node_type)
        c = GaussianFourierFeatureTransform(lc // 2, self.ff_scale,
                                            name="coord_ff")(pos)
        c = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="coord_fc1")(c)
        c = nn.gelu(c, approximate=False)
        c = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="coord_fc2")(c)
        c = nn.Dense(lc, use_bias=False, kernel_init=xavier, name="dec_combine")(
            jnp.concatenate([c, z_node], -1)
        )

        d = CrossLinearAttention(
            lc, "galerkin", heads=4, dim_head=lc, scale=32.0,
            min_freq=1 / self.res, name="decoding_xattn",
        )(c, z, pos, pos, mask=pad_mask)
        d = d + LinearAttention(
            lc, "galerkin", heads=1, dim_head=lc, scale=32.0,
            min_freq=1 / self.res, name="mix_attn",
        )(d, pos, mask=pad_mask)
        d = nn.Dense(2 * lc, use_bias=False, kernel_init=xavier, name="expand")(d)

        prop_ln = nn.LayerNorm(name="prop_ln")
        prop_fcs = [
            nn.Dense(2 * lc, use_bias=False, kernel_init=xavier, name=f"prop_fc{i}")
            for i in range(4)
        ]
        out_ln = nn.LayerNorm(name="out_ln")
        out_fcs = [
            nn.Dense(2 * lc, use_bias=False, kernel_init=xavier, name="out_fc1"),
            nn.Dense(lc, use_bias=False, kernel_init=xavier, name="out_fc2"),
            nn.Dense(self.out_channels, kernel_init=xavier, name="out_fc3"),
        ]

        def propagate(zz):
            hcat = jnp.concatenate([prop_ln(zz), z_node, pos], -1)
            for i, fc in enumerate(prop_fcs):
                hcat = fc(hcat)
                if i < 3:
                    hcat = nn.gelu(hcat, approximate=False)
            return hcat + zz

        def decode(zz):
            u = jnp.concatenate([out_ln(zz), z_node], -1)
            u = nn.relu(out_fcs[0](u))
            u = nn.relu(out_fcs[1](u))
            return out_fcs[2](u)

        frames = []
        for _ in range(forward_steps):
            d = propagate(d)
            frames.append(decode(d))
        out = jnp.stack(frames, axis=1)  # (b, steps, n, out)
        if pad_mask is not None:
            out = jnp.where(pad_mask[:, None, :, None], out, 0.0)
        return out
