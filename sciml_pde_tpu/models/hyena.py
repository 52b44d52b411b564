"""Hyena operator comparison suite.

Capability parity with the reference's vendored baseline
(``Hyena Model Comparison/nn_module/hyenaoperator.py:9-180`` and
``hyena_module.py:24-64``):
  - ``fftconv``: length-2L zero-padded FFT long convolution + per-channel
    bias ("D") skip;
  - ``PositionalEmbedding``: [t, Re/Im of complex exponentials] filter input;
  - ``Sin`` activation with trainable frequency;
  - ``ExponentialModulation`` of the implicit filter;
  - ``HyenaFilter``: sine-activated implicit MLP generating the long kernel;
  - ``HyenaOperator`` order-2 recurrence with depthwise short conv gating;
  - ``hyena1d``: 8 parallel (norm -> Hyena -> norm -> +x -> FFN) branches
    summed — the bottleneck spliced between the OFormer encoder and decoder
    (eval_hyena_rd2d.py:29-49).

TPU note: the inverse FFT is expressed as ``conj(fft(conj(x)))`` so only
forward complex-to-complex FFTs are emitted (the irfft lowering is
unavailable on some TPU runtimes; forward FFT is supported).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

xavier = nn.initializers.xavier_uniform()


def _ifft_unnormalized(x, axis=-1):
    """Inverse DFT without the 1/n factor, using only forward FFTs."""
    return jnp.conj(jnp.fft.fft(jnp.conj(x), axis=axis))


def fftconv(u: jnp.ndarray, k: jnp.ndarray, d_bias: jnp.ndarray) -> jnp.ndarray:
    """Causal long convolution (reference hyenaoperator.py:9-20).

    u: (B, D, L); k: (D, L); d_bias: (D,).
    """
    seqlen = u.shape[-1]
    fft_size = 2 * seqlen
    k_f = jnp.fft.fft(k, n=fft_size, axis=-1) / fft_size
    u_f = jnp.fft.fft(u.astype(jnp.float32), n=fft_size, axis=-1)
    y = jnp.real(_ifft_unnormalized(u_f * k_f))[..., :seqlen]
    return (y + u * d_bias[..., None]).astype(u.dtype)


class Sin(nn.Module):
    dim: int
    w: float = 10.0

    @nn.compact
    def __call__(self, x):
        freq = self.param("freq", nn.initializers.constant(self.w), (1, self.dim))
        return jnp.sin(freq * x)


def positional_embedding(emb_dim: int, seq_len: int) -> tuple[np.ndarray, np.ndarray]:
    """z (1, L, emb_dim) = [t, Re z, Im z]; t (1, L, 1)."""
    t = np.linspace(0, 1, seq_len)[None, :, None].astype(np.float32)
    bands = (emb_dim - 1) // 2
    t_rescaled = np.linspace(0, seq_len - 1, seq_len)[None, :, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = np.linspace(1e-4, bands - 1, bands)[None, None]
    z = np.exp(-1j * f * w)
    z = np.concatenate([t, z.real, z.imag], axis=-1).astype(np.float32)
    return z, t


class ExponentialModulation(nn.Module):
    d_model: int
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    target: float = 1e-2
    shift: float = 0.0

    @nn.compact
    def __call__(self, t, x):
        max_decay = math.log(self.target) / self.fast_decay_pct
        min_decay = math.log(self.target) / self.slow_decay_pct
        deltas = np.linspace(min_decay, max_decay, self.d_model)[None, None].astype(np.float32)
        decay = jnp.exp(-t * jnp.abs(jnp.asarray(deltas)))
        return x * (decay + self.shift)


class HyenaFilter(nn.Module):
    d_model: int
    emb_dim: int = 3
    order: int = 64  # width of the implicit MLP
    seq_len: int = 1024
    w: float = 1.0
    num_inner_mlps: int = 8

    def setup(self):
        self.bias = self.param("bias", nn.initializers.normal(1.0), (self.d_model,))
        layers = [nn.Dense(self.order, kernel_init=xavier), Sin(self.order, self.w)]
        for _ in range(self.num_inner_mlps):
            layers += [nn.Dense(self.order, kernel_init=xavier), Sin(self.order, self.w)]
        layers += [nn.Dense(self.d_model, use_bias=False, kernel_init=xavier)]
        self.implicit = layers
        self.modulation = ExponentialModulation(self.d_model)

    def filter(self, L: int):
        z, t = positional_embedding(self.emb_dim, self.seq_len)
        h = jnp.asarray(z[:, :L])
        for layer in self.implicit:
            h = layer(h)
        return self.modulation(jnp.asarray(t[:, :L]), h)  # (1, L, d_model)


class HyenaOperator(nn.Module):
    """Order-2 Hyena recurrence (reference hyenaoperator.py:180-246)."""

    d_model: int
    l_max: int = 4096
    order: int = 2
    filter_order: int = 64

    @nn.compact
    def __call__(self, u):
        # u: (B, L, D)
        b, l, _ = u.shape
        if l > self.l_max:
            raise ValueError(
                f"sequence length {l} exceeds l_max={self.l_max}; construct "
                "the operator with l_max >= the flattened grid size")
        l_filter = min(l, self.l_max)
        inner = self.d_model * (self.order + 1)
        u = nn.Dense(inner, kernel_init=xavier, name="in_proj")(u)
        u = jnp.swapaxes(u, 1, 2)  # (B, inner, L)

        # depthwise causal short conv, kernel 3, pad 2, truncate to L
        kern = self.param(
            "short_filter",
            nn.initializers.normal(1.0 / math.sqrt(3)),
            (inner, 3),
        )
        short_bias = self.param("short_bias", nn.initializers.zeros, (inner,))
        up = jnp.pad(u, ((0, 0), (0, 0), (2, 2)))
        uc = (
            up[..., :-2] * kern[:, 0:1] + up[..., 1:-1] * kern[:, 1:2] + up[..., 2:] * kern[:, 2:3]
        )
        uc = (uc + short_bias[:, None])[..., :l_filter]

        splits = jnp.split(uc, self.order + 1, axis=1)
        *x, v = splits

        filt = HyenaFilter(
            self.d_model * (self.order - 1), order=self.filter_order,
            seq_len=self.l_max, name="filter_fn",
        )
        k = filt.filter(l_filter)[0]  # (L, (order-1)*d)
        k = jnp.swapaxes(k, 0, 1).reshape(self.order - 1, self.d_model, l_filter)
        bias = filt.bias.reshape(self.order - 1, self.d_model)

        for o, x_i in enumerate(reversed(x[1:])):
            v = v * x_i
            v = fftconv(v, k[o], bias[o])

        y = jnp.swapaxes(v * x[0], 1, 2)
        return nn.Dense(self.d_model, kernel_init=xavier, name="out_proj")(y)


class Hyena1dBlock(nn.Module):
    """8 parallel Hyena branches, summed (reference hyena_module.py:24-64)."""

    dim: int
    branches: int = 8
    l_max: int = 4096

    @nn.compact
    def __call__(self, x):
        def norm(t):
            mu = jnp.mean(t, axis=-1, keepdims=True)
            var = jnp.var(t, axis=-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-5)

        total = 0.0
        for i in range(self.branches):
            h = norm(HyenaOperator(self.dim, self.l_max, name=f"h{i+1}")(norm(x))) + x
            h = nn.Dense(self.dim, kernel_init=xavier, name=f"f{i+1}a")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, kernel_init=xavier, name=f"f{i+1}b")(h)
            total = total + h
        return total


class HyenaOFormer2D(nn.Module):
    """OFormer encoder -> hyena1d bottleneck -> pointwise decoder, the
    hybrid evaluated in the reference (eval_hyena_rd2d.py:29-49)."""

    input_channels: int
    out_channels: int
    in_emb_dim: int = 96
    latent_channels: int = 192
    heads: int = 4
    depth: int = 2
    out_steps: int = 1
    branches: int = 8
    l_max: int = 4096  # must cover the flattened grid token count
    remat: bool = False

    def setup(self):
        from sciml_pde_tpu.models.oformer import (
            PointWiseDecoder2D,
            SpatialTemporalEncoder2D,
        )

        self.encoder = SpatialTemporalEncoder2D(
            self.input_channels, self.in_emb_dim, self.latent_channels,
            self.heads, self.depth,
        )
        self.hyena = Hyena1dBlock(self.latent_channels, branches=self.branches,
                                  l_max=self.l_max)
        self.decoder = PointWiseDecoder2D(
            self.latent_channels, self.out_channels, self.out_steps,
            propagator_depth=1, remat=self.remat,
        )

    def __call__(self, x, pos):
        z = self.encoder(x, pos)
        z = self.hyena(z)
        u, _ = self.decoder(z, pos, pos)
        return u

    def rollout(self, x, pos, forward_steps):
        """Latent rollout through the hyena bottleneck: one encode, then
        ``forward_steps`` latent propagator/decode steps
        (eval_hyena_rd2d.py:29-49 protocol)."""
        z = self.encoder(x, pos)
        z = self.hyena(z)
        return self.decoder.rollout(z, pos, forward_steps, pos)
