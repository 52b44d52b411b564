"""VideoMAE-style spatio-temporal Transformer operators (2D), baseline + aux.

Capability parity with the reference family
(``pdebench/models/Transformer_2D_NS/Ours/transformer.py`` and
``transformer_aux.py``; DR variants ``Transformer_2D_DR/*``):

  - tubelet/patch embedding (Conv3d kernel=stride, reference
    transformer.py:207-231) — implemented as reshape+matmul, the canonical
    MXU form of a stride=kernel conv;
  - fixed sinusoid position table (transformer.py:234-244);
  - pre-norm blocks with DropPath, optional layer-scale gamma_1/2
    (transformer.py:171-204);
  - attention with the q-bias/v-bias trick: qkv projection has biases on q
    and v but not k (transformer.py:124-168);
  - encoder (default 12 x 768) -> biasless encoder_to_decoder -> decoder
    (default 8 x 512) -> per-token pixel head -> unpatchify -> LAST frame
    (transformer.py:424-593);
  - per-(T,H,W) instance normalization with stop-gradient and output
    de-normalization (transformer.py:530-545);
  - masked-SSL path with mask token + head_ssl (transformer.py:399-421);
  - gradient checkpointing flag (transformer.py:325-327) via nn.remat;
  - aux subclass with per-pixel ``head_primary``/``head_auxiliary``
    Linear(C, C) (transformer_aux.py:25-31), shared encoder/decoder run on
    both independently-normalized streams.

TPU-first notes: channels-last (B, T, H, W, C) end to end; bf16 compute
with fp32 params/softmax via the ``dtype`` field; both streams of the aux
variant run through the shared trunk as ONE concatenated batch when their
shapes match (the reference runs the trunk twice).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.models.common import instance_norm_stats

xavier = nn.initializers.xavier_uniform()


@functools.lru_cache(maxsize=32)
def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sine-cosine table (reference transformer.py:234-244)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def drop_path(x, rate, deterministic, rng):
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "pallas"  # pallas (fused kernel w/ jnp fallback) | jnp

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        qkv_w = self.param("qkv_kernel", xavier, (x.shape[-1], 3 * self.dim))
        qkv = jnp.einsum("bnd,df->bnf", x.astype(self.dtype), qkv_w.astype(self.dtype))
        if self.qkv_bias:
            # q and v get biases, k does not (reference transformer.py:135-155)
            q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(self.dtype)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        # (b, h, n, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)

        from sciml_pde_tpu.ops.attention import flash_attention, jnp_attention

        if self.attn_impl == "pallas":
            out = flash_attention(q, k, v, scale)
        else:
            out = jnp_attention(q, k, v, scale)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, kernel_init=xavier, dtype=self.dtype, name="proj")(out)
        return out


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=xavier, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, kernel_init=xavier, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ln = functools.partial(nn.LayerNorm, epsilon=1e-6, dtype=jnp.float32)
        h = Attention(self.dim, self.num_heads, self.qkv_bias, self.dtype, name="attn")(
            ln(name="norm1")(x)
        )
        if self.init_values > 0:
            g1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (self.dim,)
            )
            h = g1 * h
        rng = self.make_rng("dropout") if not deterministic else None
        x = x + drop_path(h, self.drop_path_rate, deterministic, rng)

        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype, name="mlp")(
            ln(name="norm2")(x)
        )
        if self.init_values > 0:
            g2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (self.dim,)
            )
            h = g2 * h
        rng = self.make_rng("dropout") if not deterministic else None
        x = x + drop_path(h, self.drop_path_rate, deterministic, rng)
        return x


class TokenStack(nn.Module):
    """A stack of transformer blocks with linear drop-path decay and
    optional rematerialization (the reference's use_checkpoint)."""

    dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        block_cls = Block
        if self.use_checkpoint:
            block_cls = nn.remat(Block, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                self.dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                float(dpr[i]), self.init_values, self.dtype, name=f"block{i}",
            )(x, deterministic)
        return x


def patchify(x, tubelet, patch):
    """(B, T, H, W, C) -> tokens (B, T/tu * H/p * W/p, tu*p*p*C), token
    features ordered (tubelet, py, px, channel) to match the reference's
    rearrange (transformer.py:561-563)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // tubelet, tubelet, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # b, t', h', w', tu, p, p, c
    return x.reshape(b, -1, tubelet * patch * patch * c)


def unpatchify(tokens, tubelet, patch, t, h, w, c):
    b = tokens.shape[0]
    x = tokens.reshape(
        b, t // tubelet, h // patch, w // patch, tubelet, patch, patch, c
    )
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t, h, w, c)


class VideoMAEOperator(nn.Module):
    """Baseline next-frame operator (reference PretrainVisionTransformer).

    __call__(x): x (B, T, H, W, C) -> next frame (B, H, W, C).
    With ``mask`` (B, N) bool: masked-SSL mode, returns per-masked-token
    pixel predictions (B, N_masked, tu*p*p*C), de-normalized.
    """

    img_size: int = 256
    patch_size: int = 16
    tubelet_size: int = 2
    in_chans: int = 3
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
    ssl: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TokenStack(
            self.encoder_dim, self.encoder_depth, self.encoder_heads,
            self.mlp_ratio, self.qkv_bias, self.drop_path_rate,
            self.init_values, self.use_checkpoint, self.dtype, name="encoder",
        )
        self.decoder = TokenStack(
            self.decoder_dim, self.decoder_depth, self.decoder_heads,
            self.mlp_ratio, self.qkv_bias, self.drop_path_rate,
            self.init_values, self.use_checkpoint, self.dtype, name="decoder",
        )
        self.patch_proj = nn.Dense(self.encoder_dim, kernel_init=xavier, name="patch_proj")
        self.encoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="encoder_norm")
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="decoder_norm")
        self.encoder_to_decoder = nn.Dense(
            self.decoder_dim, use_bias=False, kernel_init=xavier, name="encoder_to_decoder"
        )
        out_dim = self.tubelet_size * self.patch_size**2 * self.in_chans
        self.head = nn.Dense(out_dim, kernel_init=xavier, name="head")
        if self.ssl:
            self.head_ssl = nn.Dense(out_dim, kernel_init=xavier, name="head_ssl")
            self.mask_token = self.param(
                "mask_token",
                nn.initializers.truncated_normal(0.02),
                (1, 1, self.decoder_dim),
            )

    def _num_tokens(self, t, h, w):
        return (t // self.tubelet_size) * (h // self.patch_size) * (w // self.patch_size)

    def _encode(self, xn, deterministic):
        """normalized (B,T,H,W,C) -> decoder-dim tokens."""
        tokens = self.patch_proj(patchify(xn, self.tubelet_size, self.patch_size))
        pos = jnp.asarray(sinusoid_table(tokens.shape[1], self.encoder_dim))
        tokens = tokens + pos[None]
        tokens = self.encoder(tokens, deterministic)
        tokens = self.encoder_norm(tokens)
        return self.encoder_to_decoder(tokens)

    def _decode_pixels(self, tokens, deterministic):
        tokens = self.decoder(tokens, deterministic)
        return self.head(self.decoder_norm(tokens)).astype(jnp.float32)

    def __call__(
        self,
        x,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        n_masked: Optional[int] = None,
    ):
        b, t, h, w, c = x.shape
        std, mean = instance_norm_stats(x, (1, 2, 3))  # per (b, c) over T,H,W
        xn = (x - mean) / std

        if mask is not None:
            # masked-SSL: encode visible tokens, decode vis+mask, predict
            # masked pixels (reference transformer.py:530-575).  The masked
            # count must be static (shapes under jit); pass n_masked, or
            # give a concrete (non-traced) mask.
            tokens_all = self.patch_proj(patchify(xn, self.tubelet_size, self.patch_size))
            pos_e = jnp.asarray(sinusoid_table(tokens_all.shape[1], self.encoder_dim))
            tokens_all = tokens_all + pos_e[None]
            n = tokens_all.shape[1]
            if n_masked is None:
                n_masked = int(np.asarray(mask).sum() // b)
            n_vis = n - n_masked
            vis_idx = jnp.argsort(mask, axis=1, stable=True)[:, :n_vis]
            mask_idx = jnp.argsort(mask, axis=1, stable=True)[:, n_vis:]
            vis = jnp.take_along_axis(tokens_all, vis_idx[..., None], axis=1)
            vis = self.encoder_to_decoder(self.encoder_norm(self.encoder(vis, deterministic)))
            pos_d = jnp.asarray(sinusoid_table(n, self.decoder_dim))
            pos_d = jnp.broadcast_to(pos_d[None], (b, n, self.decoder_dim))
            pos_vis = jnp.take_along_axis(pos_d, vis_idx[..., None], axis=1)
            pos_msk = jnp.take_along_axis(pos_d, mask_idx[..., None], axis=1)
            full = jnp.concatenate([vis + pos_vis, self.mask_token + pos_msk], axis=1)
            dec = self.decoder(full, deterministic)
            out = self.head_ssl(self.decoder_norm(dec[:, -n_masked:])).astype(jnp.float32)
            return out  # normalized-space masked-pixel predictions

        tokens = self._encode(xn, deterministic)
        pix = self._decode_pixels(tokens, deterministic)
        vol = unpatchify(pix, self.tubelet_size, self.patch_size, t, h, w, c)
        vol = vol * std + mean  # std/mean broadcast over (B,1,1,1,C)
        return vol[:, -1]  # last frame (B, H, W, C)


class VideoMAEOperatorAux(VideoMAEOperator):
    """Aux variant.  Two reference architectures share this class:

    - NS (``Transformer_2D_NS/Ours/transformer_aux.py:25-31``): per-pixel
      Linear(C, C) ``head_primary``/``head_auxiliary`` on the last frame
      of the shared trunk (``shared_head=False``, the default).
    - DR (``Transformer_2D_DR/Ours/transformer_aux_rd.py`` ``ViT2dAux``):
      NO separate heads — the trunk's reconstruction is returned for both
      streams and only the loss weighting differs (``shared_head=True``).

    __call__(x, x_aux) -> (out_primary (B,H,W,C), out_aux (B2,H,W,C)).
    """

    shared_head: bool = False

    def setup(self):
        super().setup()
        if not self.shared_head:
            self.head_primary = nn.Dense(self.in_chans, kernel_init=xavier, name="head_primary")
            self.head_auxiliary = nn.Dense(self.in_chans, kernel_init=xavier, name="head_auxiliary")

    def _trunk_last_frame(self, xn, deterministic):
        b, t, h, w, c = xn.shape
        tokens = self._encode(xn, deterministic)
        pix = self._decode_pixels(tokens, deterministic)
        vol = unpatchify(pix, self.tubelet_size, self.patch_size, t, h, w, c)
        return vol[:, -1]

    def __call__(self, x, x_aux, deterministic: bool = True):  # type: ignore[override]
        std_p, mean_p = instance_norm_stats(x, (1, 2, 3))
        std_a, mean_a = instance_norm_stats(x_aux, (1, 2, 3))
        xn = (x - mean_p) / std_p
        xan = (x_aux - mean_a) / std_a

        if xn.shape[1:] == xan.shape[1:]:
            # one trunk pass over the concatenated batch (TPU-first; the
            # reference runs the trunk twice, transformer_aux.py:77-80)
            b = xn.shape[0]
            last = self._trunk_last_frame(jnp.concatenate([xn, xan], 0), deterministic)
            last_p, last_a = last[:b], last[b:]
        else:
            last_p = self._trunk_last_frame(xn, deterministic)
            last_a = self._trunk_last_frame(xan, deterministic)

        if self.shared_head:
            out_p, out_a = last_p, last_a
        else:
            out_p = self.head_primary(last_p)
            out_a = self.head_auxiliary(last_a)
        out_p = out_p * jnp.squeeze(std_p, (1, 2, 3))[:, None, None] + jnp.squeeze(
            mean_p, (1, 2, 3)
        )[:, None, None]
        out_a = out_a * jnp.squeeze(std_a, (1, 2, 3))[:, None, None] + jnp.squeeze(
            mean_a, (1, 2, 3)
        )[:, None, None]
        return out_p, out_a
