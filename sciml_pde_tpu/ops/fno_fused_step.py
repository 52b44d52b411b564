"""Fully-fused FNO-2D training forward/backward as Pallas TPU kernels.

Why (PERFORMANCE.md round-3 honest profile): the flagship FNO-2D step
(batch 4, 128^2, width 20, modes 12 — reference config_dr.yaml:44-47,
hot loop ``pdebench/models/fno/fno.py:70-92`` + ``fno/train.py:217-279``)
costs 2.42 ms although its matmul content is ~0.06 ms: the XLA graph is
~100 small ops whose intermediates round-trip HBM in layouts that pad a
width-20 channel axis onto 128 lanes.  This module executes the WHOLE
model per batch element inside VMEM:

  - ``bb_fwd``    grid (B, L): instance-norm stats + lift (fc0) + the four
                  spectral layers, activations carried in a VMEM scratch —
                  per layer only the (C,130,130) pre-activation is spilled
                  (needed for backward);
  - ``head_fwd``  grid (B,): fc1 + gelu + fc2 + de-norm, spatially chunked
                  so the (128, HW) hidden never exists in HBM (in XLA it
                  is a 33 MB round-trip);
  - ``head_bwd``  grid (B,): recomputes the hidden chunk-wise, accumulates
                  dW1/db1/dW2/db2 across the batch in revisited out blocks;
  - ``bb_bwd``    grid (B, L reversed): data gradient walked layer 3 -> 0
                  with the cotangent carried in scratch; spills per-layer
                  d(pre) for the weight-grad pass and accumulates
                  dW0/db0 at the fc0 boundary;
  - ``bb_wgrad``  grid (L, B): per-layer spectral/pointwise weight grads,
                  batch accumulated in revisited out blocks.

Layout: everything is channels-FIRST per element — (C, H, W) with the two
spatial dims minor, so VMEM tiles pad (130,130) -> (136,256) (~2.1x)
instead of channels-last's (130,20) -> (136,128) (~6.7x), and every
contraction is a plain 2D ``jnp.dot`` (Mosaic's safe path).  The spectral
chain is the partial-DFT formulation of ``ops/spectral.py`` (impl="dft")
expressed per element:

    W-axis rDFT (dot) -> transpose -> H-axis corner DFT (dot) ->
    mode mix (broadcast-multiply-reduce over channels; the per-mode
    (20x20) "matmuls" are too small for the MXU, so they run on the VPU
    with the (k*r)=288 mode axis in lanes) -> inverse H -> transpose ->
    Hermitian-weighted real inverse W + pointwise 1x1 + bias + gelu.

The backward is hand-derived (every step is linear except gelu; instance
norm uses stop-gradient stats, reference fno.py:139-143).  All helpers
are pure-array functions shared verbatim between the Pallas kernel bodies
and a reference composition, so they are unit-tested against ``jax.vjp``
of the flax model without Pallas in the loop
(tests/test_fno_fused_step.py); kernels run in interpreter mode off-TPU.

Precision: dots take ``preferred_element_type=f32``.  When
``ops.spectral._PRECISION`` is DEFAULT (the bf16 gate,
SCIML_DFT_PRECISION=default), dot INPUTS are cast to bf16 — same
contract as the XLA path's precision knob (closes the ADVICE r3 finding
that the v1 fused layer ignored the precision setting).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sciml_pde_tpu.ops import spectral as _spec
from sciml_pde_tpu.ops.spectral import _corner_rows, _dft_factors_1d

L_LAYERS = 4
_SQRT_2PI = float(np.sqrt(2.0 * np.pi))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot_dtype():
    """bf16 dot inputs iff the global dft-precision knob says DEFAULT."""
    return (
        jnp.bfloat16
        if _spec._PRECISION == jax.lax.Precision.DEFAULT
        else jnp.float32
    )


def _dot(a, b):
    dt = _dot_dtype()
    return jnp.dot(a.astype(dt), b.astype(dt), preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# Constant DFT factors (numpy, cached per (n, modes))
# --------------------------------------------------------------------------


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _pad128(n: int) -> int:
    return -(-n // 128) * 128


class SpectralFactors(NamedTuple):
    """All constant partial-DFT bases for one (Hp, Wp, m1, m2) geometry,
    embedded in TILE-ALIGNED zero-padded arrays.

    Mosaic supports only a narrow set of shape casts: leading-dim
    merges/splits whose resulting sublane dim is a multiple of 8, and
    minor-dim merges whose lane dim is a multiple of 128 (the round-5
    iso probes fail 'infer-vector-layout: unsupported shape cast'
    otherwise).  So every axis a kernel merges over is padded up front —
    HPAD = ceil8(Hp), WPAD = ceil128(Wp), KP = ceil8(m2),
    RP = ceil8(2*m1) — and the factor matrices carry exact ZEROS in the
    pad rows/cols, which keeps the math identical: padded field regions
    multiply into zeros everywhere in the spectral chain.

    Shapes: fr, fi (WPAD, KP) forward W-axis rDFT; gr, gi (HPAD, RP)
    forward H-axis corner DFT; hr, hi (RP, HPAD) inverse H (no Hermitian
    doubling); wr, wi (KP, WPAD) inverse W (Hermitian-doubled, /Wp; zero
    cols >= Wp so the physical pad region of the field stays exactly 0).
    + transposes of each (suffix t) so kernels never transpose weights.
    """

    fr: np.ndarray
    fi: np.ndarray
    gr: np.ndarray
    gi: np.ndarray
    hr: np.ndarray
    hi: np.ndarray
    wr: np.ndarray
    wi: np.ndarray
    frt: np.ndarray
    fit: np.ndarray
    grt: np.ndarray
    git: np.ndarray
    hrt: np.ndarray
    hit: np.ndarray
    wrt: np.ndarray
    wit: np.ndarray


def _embed(a: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), np.float32)
    out[: a.shape[0], : a.shape[1]] = a
    return out


@functools.lru_cache(maxsize=16)
def spectral_factors(hp: int, wp: int, m1: int, m2: int) -> SpectralFactors:
    (fr, fi), (iwr, iwi) = _dft_factors_1d(wp, m2, None)
    (gr, gi), (ihr, ihi) = _dft_factors_1d(hp, 2 * m1, _corner_rows(hp, m1))
    hpad, wpad = _pad8(hp), _pad128(wp)
    kp, rp = _pad8(m2), _pad8(2 * m1)
    fr, fi = _embed(fr, wpad, kp), _embed(fi, wpad, kp)
    gr, gi = _embed(gr, hpad, rp), _embed(gi, hpad, rp)
    ihr, ihi = _embed(ihr, rp, hpad), _embed(ihi, rp, hpad)
    iwr, iwi = _embed(iwr, kp, wpad), _embed(iwi, kp, wpad)
    mk = lambda a: np.ascontiguousarray(a, np.float32)
    return SpectralFactors(
        fr=mk(fr), fi=mk(fi), gr=mk(gr), gi=mk(gi),
        hr=mk(ihr), hi=mk(ihi), wr=mk(iwr), wi=mk(iwi),
        frt=mk(fr.T), fit=mk(fi.T), grt=mk(gr.T), git=mk(gi.T),
        hrt=mk(ihr.T), hit=mk(ihi.T), wrt=mk(iwr.T), wit=mk(iwi.T),
    )


# --------------------------------------------------------------------------
# Packed parameters (kernel-friendly orientations)
# --------------------------------------------------------------------------


class FastFNOParams(NamedTuple):
    """FNO2d parameters re-oriented for the channels-first kernels.

    wmr/wmi: (L, C, O, KP, RP) — complex mode-mix weights as a 4D
      per-layer block (KP = ceil8(m2) rfft modes, RP = ceil8(2*m1)
      corner rows), zero-padded to tile-aligned mode dims; the mix runs
      as a 4D broadcast-multiply-reduce, so no lane-remix shape cast is
      ever needed (the padded entries have structurally zero gradients
      and stay exactly zero under training).
    pw:  (L, C, O) 1x1 conv kernels;  pb: (L, O) their biases.
    w0t: (C, F) transposed lift kernel; w1t: (128, C); w2t: (Co, 128).
    """

    wmr: jnp.ndarray
    wmi: jnp.ndarray
    pw: jnp.ndarray
    pb: jnp.ndarray
    w0t: jnp.ndarray
    b0: jnp.ndarray
    w1t: jnp.ndarray
    b1: jnp.ndarray
    w2t: jnp.ndarray
    b2: jnp.ndarray


def pack_params(tree, modes1: int, modes2: int) -> FastFNOParams:
    """Flax FNO2d param tree -> FastFNOParams (pure jnp; jit-safe)."""
    bb = tree["backbone"] if "backbone" in tree else tree
    kp, rp = _pad8(modes2), _pad8(2 * modes1)
    wmr, wmi, pw, pb = [], [], [], []
    for i in range(L_LAYERS):
        conv = bb[f"conv{i}"]
        w1, w2 = conv["w1"], conv["w2"]  # (2, C, O, m1, m2)
        wr = jnp.concatenate([w1[0], w2[0]], axis=2)  # (C, O, 2m1, m2)
        wi = jnp.concatenate([w1[1], w2[1]], axis=2)
        # (C, O, r, k) -> (C, O, k, r) -> zero-pad to (C, O, KP, RP):
        # matches the (C, KP, RP) layout the kernels produce after the
        # corner DFT (padded mode slots hold exact zeros)
        padkr = [(0, 0), (0, 0), (0, kp - modes2), (0, rp - 2 * modes1)]
        wmr.append(jnp.pad(jnp.transpose(wr, (0, 1, 3, 2)), padkr))
        wmi.append(jnp.pad(jnp.transpose(wi, (0, 1, 3, 2)), padkr))
        dense = bb[f"w{i}"]["Dense_0"]
        pw.append(dense["kernel"])  # (C, O)
        pb.append(dense["bias"])
    fc0 = bb["fc0"]["Dense_0"]
    fc1 = bb["fc1"]["Dense_0"]
    head = tree.get("fc2", tree.get("fc2_primary"))
    fc2 = head["Dense_0"] if "Dense_0" in head else head
    return FastFNOParams(
        wmr=jnp.stack(wmr), wmi=jnp.stack(wmi),
        pw=jnp.stack(pw), pb=jnp.stack(pb),
        w0t=fc0["kernel"].T, b0=fc0["bias"],
        w1t=fc1["kernel"].T, b1=fc1["bias"],
        w2t=fc2["kernel"].T, b2=fc2["bias"],
    )


def unpack_grads(g: FastFNOParams, modes1: int, modes2: int, like_tree):
    """FastFNOParams cotangents -> flax param-tree cotangents."""
    m1, m2 = modes1, modes2
    bb = {}
    for i in range(L_LAYERS):
        # drop the tile-alignment pad slots (structural zeros)
        wr = jnp.transpose(g.wmr[i][:, :, :m2, : 2 * m1], (0, 1, 3, 2))
        wi = jnp.transpose(g.wmi[i][:, :, :m2, : 2 * m1], (0, 1, 3, 2))
        w1 = jnp.stack([wr[:, :, :m1], wi[:, :, :m1]])
        w2 = jnp.stack([wr[:, :, m1:], wi[:, :, m1:]])
        bb[f"conv{i}"] = {"w1": w1, "w2": w2}
        bb[f"w{i}"] = {"Dense_0": {"kernel": g.pw[i], "bias": g.pb[i]}}
    bb["fc0"] = {"Dense_0": {"kernel": g.w0t.T, "bias": g.b0}}
    bb["fc1"] = {"Dense_0": {"kernel": g.w1t.T, "bias": g.b1}}
    out = {"backbone": bb, "fc2": {"Dense_0": {"kernel": g.w2t.T, "bias": g.b2}}}
    if "backbone" not in like_tree:  # flat tree (bare FNOBackbone use)
        out.update(out.pop("backbone"))
    return out


# --------------------------------------------------------------------------
# Array-level building blocks (shared by kernels, reference and tests)
# --------------------------------------------------------------------------


_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))


def _erf(x):
    """erf from exp/mul/add only: Mosaic implements neither erf nor erfc.

    Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — below f32 noise
    for the gelu use): erf(x) = 1 - poly(t) e^{-x^2}, t = 1/(1+px),
    extended to x<0 by odd symmetry.
    """
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p_ = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p_ * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    """Exact (erf) gelu — torch F.gelu default, written via _erf."""
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _gelu_grad(x):
    """d/dx [x * Phi(x)] = Phi(x) + x * phi(x) (exact/erf gelu)."""
    phi = jnp.exp(-0.5 * x * x) / _SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(x * _INV_SQRT2))
    return cdf + x * phi


def _spectral_fwd_el(h, wmr, wmi, f):
    """Spectral conv for ONE element: h (C, HPAD, WPAD) -> (O, HPAD, WPAD).

    All shape casts are leading-dim merges/splits over 8-aligned sublane
    dims (HPAD, KP) — the only casts Mosaic's infer-vector-layout
    accepts — and the mode mix runs in 4D broadcast form so the
    (C*KP, RP) <-> (C, KP*RP) lane remix never exists.  Returns the
    result and the corner spectrum (br, bi) each (C, KP, RP) for the
    weight-grad pass.
    """
    c, hpad, wpad = h.shape
    kp = f.fr.shape[1]
    rp = f.gr.shape[1]
    o = wmr.shape[1]
    hf = h.reshape(c * hpad, wpad)
    ar = _dot(hf, f.fr).reshape(c, hpad, kp)  # (C, HPAD, KP)
    ai = _dot(hf, f.fi).reshape(c, hpad, kp)
    art = jnp.transpose(ar, (0, 2, 1)).reshape(c * kp, hpad)  # (C*KP, HPAD)
    ait = jnp.transpose(ai, (0, 2, 1)).reshape(c * kp, hpad)
    br = (_dot(art, f.gr) - _dot(ait, f.gi)).reshape(c, kp, rp)
    bi = (_dot(art, f.gi) + _dot(ait, f.gr)).reshape(c, kp, rp)
    # mode mix on the VPU: per-mode (C x O) contractions are too small
    # for the MXU; broadcast-multiply then reduce the leading channel axis
    cr = (br[:, None] * wmr).sum(0) - (bi[:, None] * wmi).sum(0)  # (O,KP,RP)
    ci = (br[:, None] * wmi).sum(0) + (bi[:, None] * wmr).sum(0)
    crf = cr.reshape(o * kp, rp)
    cif = ci.reshape(o * kp, rp)
    dr_ = (_dot(crf, f.hr) - _dot(cif, f.hi)).reshape(o, kp, hpad)
    di_ = (_dot(crf, f.hi) + _dot(cif, f.hr)).reshape(o, kp, hpad)
    drt = jnp.transpose(dr_, (0, 2, 1)).reshape(o * hpad, kp)
    dit = jnp.transpose(di_, (0, 2, 1)).reshape(o * hpad, kp)
    s = (_dot(drt, f.wr) - _dot(dit, f.wi)).reshape(o, hpad, wpad)
    return s, (br, bi)


def _spectral_adj_el(ds, wmr, wmi, f):
    """Adjoint of _spectral_fwd_el wrt its input:
    ds (O, HPAD, WPAD) -> (C, HPAD, WPAD).

    Also returns the adjoint corner spectrum (dcr, dci), each
    (O, KP, RP) — the cotangent of the mode-mix output — which the
    weight-grad pass combines with the forward corner spectrum.
    """
    o, hpad, wpad = ds.shape
    kp = f.fr.shape[1]
    rp = f.gr.shape[1]
    c = wmr.shape[0]
    dsf = ds.reshape(o * hpad, wpad)
    ddrt = _dot(dsf, f.wrt).reshape(o, hpad, kp)  # adjoint of real inv W
    ddit = -_dot(dsf, f.wit).reshape(o, hpad, kp)
    ddr = jnp.transpose(ddrt, (0, 2, 1)).reshape(o * kp, hpad)
    ddi = jnp.transpose(ddit, (0, 2, 1)).reshape(o * kp, hpad)
    dcr = (_dot(ddr, f.hrt) + _dot(ddi, f.hit)).reshape(o, kp, rp)
    dci = (-_dot(ddr, f.hit) + _dot(ddi, f.hrt)).reshape(o, kp, rp)
    # adjoint of the mix: reduce the O axis, permuted to LEADING first
    # (leading-axis reduces are the form the fwd mix already uses)
    wmrT = jnp.transpose(wmr, (1, 0, 2, 3))  # (O, C, KP, RP) batch perm
    wmiT = jnp.transpose(wmi, (1, 0, 2, 3))
    dbr = (dcr[:, None] * wmrT).sum(0) + (dci[:, None] * wmiT).sum(0)
    dbi = (-dcr[:, None] * wmiT).sum(0) + (dci[:, None] * wmrT).sum(0)
    dbrf = dbr.reshape(c * kp, rp)
    dbif = dbi.reshape(c * kp, rp)
    dart = (_dot(dbrf, f.grt) + _dot(dbif, f.git)).reshape(c, kp, hpad)
    dait = (-_dot(dbrf, f.git) + _dot(dbif, f.grt)).reshape(c, kp, hpad)
    dar = jnp.transpose(dart, (0, 2, 1)).reshape(c * hpad, kp)
    dai = jnp.transpose(dait, (0, 2, 1)).reshape(c * hpad, kp)
    dh = (_dot(dar, f.frt) + _dot(dai, f.fit)).reshape(c, hpad, wpad)
    return dh, (dcr, dci)


def _layer_fwd_el(h, wmr, wmi, pw, pb, f, last: bool):
    """One FNO layer for one element.  Returns (h_next, pre)."""
    c = h.shape[0]
    s, _ = _spectral_fwd_el(h, wmr, wmi, f)
    p = _dot(pw.T, h.reshape(c, -1)).reshape(s.shape)
    pre = s + p + pb[:, None, None]
    return (pre if last else _gelu(pre)), pre


def _layer_bwd_data_el(dh_next, pre, wmr, wmi, pw, f, last):
    """Data cotangent of one layer.  Returns (dh, dpre).

    ``last`` may be a traced bool (kernel program_id comparison), so the
    gelu branch is a select, not python control flow.
    """
    dpre = jnp.where(last, dh_next, dh_next * _gelu_grad(pre))
    dh_spec, _ = _spectral_adj_el(dpre, wmr, wmi, f)
    o = dpre.shape[0]
    dh_pw = _dot(pw, dpre.reshape(o, -1)).reshape(dh_spec.shape)
    return dh_spec + dh_pw, dpre


def _layer_wgrad_el(h, dpre, wmr, wmi, f):
    """Weight cotangents of one layer from its input h and dpre."""
    c, o = h.shape[0], dpre.shape[0]
    _, (br, bi) = _spectral_fwd_el(h, wmr, wmi, f)        # (C, KP, RP)
    _, (dcr, dci) = _spectral_adj_el(dpre, wmr, wmi, f)   # (O, KP, RP)
    dwmr = br[:, None] * dcr[None] + bi[:, None] * dci[None]   # (C,O,KP,RP)
    dwmi = -bi[:, None] * dcr[None] + br[:, None] * dci[None]
    # minor merges are legal here: WPAD is 128-aligned by construction
    dpw = _dot(h.reshape(c, -1), dpre.reshape(o, -1).T)
    dpb = _sum_cols(dpre.reshape(o, -1))  # (O, 1), ones contraction
    return dwmr, dwmi, dpw, dpb


def _sum_cols(x):
    """Row-sums of a rank-2 array as an (N, 1) column — via a ones-vector
    CONTRACTION, never a reduction.

    XLA lowers ``keepdims=True`` (and plain) reductions that leave a
    single dim as reduce-to-RANK-1 + reshape; inside a Mosaic kernel the
    rank-1 intermediate aborts lowering with ``Check failed: arr.size()
    >= layout_rank`` (round-4/5 on-chip crashes, perf_probe iso_*
    bisection).  A matmul with a ones column produces (N, 1) directly
    with no rank-1 value anywhere.  Exact f32 (not _dot): bias grads
    must not round through bf16.
    """
    return jnp.dot(x, jnp.ones((x.shape[1], 1), jnp.float32),
                   preferred_element_type=jnp.float32)


def _stats_el(x5):
    """Instance-norm stats for one element: x5 (T, Cc, X, Y) ->
    (mean, std) each of shape (1, Cc, 1, 1) — per physical channel Cc,
    unbiased over (T, X, Y) + 1e-7 (fno.py:139).

    Mosaic-legal reduction shapes only.  jnp's ``keepdims`` never
    reaches Mosaic (jax lowers it as reduce + reshape), so a joint
    axis=(2,3) reduce still trips 'reductions over both trailing
    dimensions are only supported when the resulting value has a
    trailing axis of size 1' (round-5 probes).  Instead: per-t slices
    reduce ONE trailing axis at a time, the row axis folds via a ones
    contraction (_sum_cols), and the T fold is a static unrolled sum of
    rank-2 columns — no multi-trailing reduce, no rank-1 value.
    """
    mc, sc = _stats_cols(x5)
    return mc[None, :, :, None], sc[None, :, :, None]


def _stats_cols(x5):
    """As _stats_el but returning (mean, std) as (Cc, 1) COLUMNS — the
    form the head's per-channel de-norm consumes directly."""
    t, cc, xx, yy = x5.shape
    n = t * xx * yy
    acc = _sum_cols(jnp.sum(x5[0], axis=2))          # (Cc, 1)
    for i in range(1, t):
        acc = acc + _sum_cols(jnp.sum(x5[i], axis=2))
    mean_col = acc / n
    mean = mean_col[None, :, :, None]                # (1, Cc, 1, 1)
    sq = (x5 - mean) ** 2
    sacc = _sum_cols(jnp.sum(sq[0], axis=2))
    for i in range(1, t):
        sacc = sacc + _sum_cols(jnp.sum(sq[i], axis=2))
    return mean_col, jnp.sqrt(sacc / (n - 1)) + 1e-7


def _prep_el(x5, grid2, mean, std):
    """Normalize + flatten (t-major feature order, matching the reference
    reshape B,X,Y,T*C) + append grid channels: -> (F=T*Cc+G, X, Y).
    mean/std are the (1, Cc, 1, 1) keepdims stats of ``_stats_el``."""
    t, cc, xx, yy = x5.shape
    xn = (x5 - mean) / std
    return jnp.concatenate([xn.reshape(t * cc, xx, yy), grid2], axis=0)


# --------------------------------------------------------------------------
# Reference composition (pure jnp; what the kernels must reproduce)
# --------------------------------------------------------------------------


def fno2d_fused_reference(win, grid2, p: FastFNOParams, modes1, modes2, pad=2):
    """win (B, T, Cc, X, Y), grid2 (G, X, Y) -> pred (B, Cc, X, Y).

    Mirrors models.fno.FNO2d.__call__ exactly (instance norm -> lift ->
    pad -> 4 layers -> unpad -> fc1 -> gelu -> fc2 -> de-norm) in the
    channels-first layout.
    """
    b, t, cc, xx, yy = win.shape
    hp, wp = xx + pad, yy + pad
    f = spectral_factors(hp, wp, modes1, modes2)
    f = SpectralFactors(*(jnp.asarray(a) for a in f))
    hpad, wpad = f.gr.shape[0], f.fr.shape[0]
    c = p.w0t.shape[0]

    def one(x5):
        mean, std = _stats_el(x5)  # (1, Cc, 1, 1) keepdims stats
        mean, std = jax.lax.stop_gradient(mean), jax.lax.stop_gradient(std)
        inp = _prep_el(x5, grid2, mean, std)
        h0 = (_dot(p.w0t, inp.reshape(inp.shape[0], -1)) + p.b0[:, None]).reshape(c, xx, yy)
        # physical field is tile-padded; logical FNO pad [xx:hp) and the
        # physical pad [hp:HPAD) are both zeros, and the zero-padded DFT
        # factors keep them out of the spectral path exactly
        h = jnp.zeros((c, hpad, wpad), jnp.float32).at[:, :xx, :yy].set(h0)
        for i in range(L_LAYERS):
            h, _ = _layer_fwd_el(h, p.wmr[i], p.wmi[i], p.pw[i], p.pb[i], f,
                                 last=(i == L_LAYERS - 1))
        bb = h[:, :xx, :yy]
        t1 = _gelu(_dot(p.w1t, bb.reshape(c, -1)) + p.b1[:, None])
        outn = (_dot(p.w2t, t1) + p.b2[:, None]).reshape(-1, xx, yy)
        return outn * std[0] + mean[0]  # (Cc,1,1) broadcast over (Cc,X,Y)

    return jax.vmap(one)(win)


# --------------------------------------------------------------------------
# Pallas kernels
# --------------------------------------------------------------------------


def _bb_fwd_kernel(win_ref, grid_ref, wmr_ref, wmi_ref, pw_ref, pbt_ref,
                   w0t_ref, b0_ref, facs_refs, pre_ref, bbout_ref, stats_ref,
                   h0p_ref, h_scr):
    i = pl.program_id(1)
    f = SpectralFactors(*(r[:] for r in facs_refs))
    c, hp, wp = h_scr.shape
    xx, yy = bbout_ref.shape[3], bbout_ref.shape[4]

    @pl.when(i == 0)
    def _():
        x5 = win_ref[0]
        mean, std = _stats_el(x5)  # (1, Cc, 1, 1) each
        # stats layout (Cc, 2): mean column 0, std column 1 — the shape
        # the head kernels consume directly as (Cc, 1) columns
        stats_ref[0] = jnp.concatenate(
            [mean[0, :, :, 0], std[0, :, :, 0]], axis=1
        )
        inp = _prep_el(x5, grid_ref[:], mean, std)
        h0 = (_dot(w0t_ref[:], inp.reshape(inp.shape[0], -1))
              + b0_ref[:]).reshape(c, xx, yy)  # b0 is a (C, 1) column
        h_scr[:] = jnp.zeros((c, hp, wp), jnp.float32)
        h_scr[:, :xx, :yy] = h0
        h0p_ref[0] = h_scr[:]

    last = i == L_LAYERS - 1
    h = h_scr[:]
    s, _ = _spectral_fwd_el(h, wmr_ref[0], wmi_ref[0], f)
    p = _dot(pw_ref[0].T, h.reshape(c, -1)).reshape(s.shape)
    # pb ships TRANSPOSED as the full (O, L) array — a (1, O) block of
    # (L, O) violates Mosaic's (8,128)-divisible-or-full block rule, a
    # row read pb[i] would be the forbidden rank-1, and a dynamic
    # lane-dim slice pbt[:, ds(i,1)] leans on minor-dim dynamic indexing;
    # selecting the column as a one-hot CONTRACTION uses only full-block
    # static-shape ops (iota/compare/matmul) — unconditionally legal
    onehot_i = (jax.lax.broadcasted_iota(jnp.int32, (L_LAYERS, 1), 0)
                == i).astype(jnp.float32)
    # exact f32 dot (not _dot): a bf16 cast here would round the bias
    bias_col = jnp.dot(pbt_ref[:], onehot_i,
                       preferred_element_type=jnp.float32)  # (O, 1)
    pre = s + p + bias_col[:, :, None]
    pre_ref[0, 0] = pre
    h_scr[:] = jnp.where(last, pre, _gelu(pre))

    @pl.when(last)
    def _():
        bbout_ref[0, 0] = h_scr[:, :xx, :yy]


def _head_fwd_kernel(bb_ref, stats_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                     pred_ref, *, n_chunks: int):
    c = bb_ref.shape[1]
    xx, yy = bb_ref.shape[2], bb_ref.shape[3]
    hw = xx * yy
    ck = hw // n_chunks
    bb = bb_ref[0].reshape(c, hw)
    st = stats_ref[0]        # (Cc, 2)
    mean = st[:, 0:1]        # (Cc, 1) columns — never rank-1
    std = st[:, 1:2]
    for j in range(n_chunks):
        sl = slice(j * ck, (j + 1) * ck)
        t1 = _gelu(_dot(w1t_ref[:], bb[:, sl]) + b1_ref[:])   # b1 (H, 1)
        outn = _dot(w2t_ref[:], t1) + b2_ref[:]               # b2 (Co, 1)
        pred_ref[0, :, sl] = outn * std + mean


def _head_bwd_kernel(dpred_ref, bb_ref, stats_ref, w1t_ref, b1_ref, w2t_ref,
                     dbb_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
                     *, n_chunks: int):
    b = pl.program_id(0)
    c = bb_ref.shape[1]
    xx, yy = bb_ref.shape[2], bb_ref.shape[3]
    hw = xx * yy
    ck = hw // n_chunks
    bb = bb_ref[0].reshape(c, hw)
    std = stats_ref[0][:, 1:2]  # (Co, 1) column
    co = dpred_ref.shape[1]
    dpred = dpred_ref[0].reshape(co, hw) * std

    @pl.when(b == 0)
    def _():
        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    for j in range(n_chunks):
        sl = slice(j * ck, (j + 1) * ck)
        bbc = bb[:, sl]
        pre1 = _dot(w1t_ref[:], bbc) + b1_ref[:]  # b1 (H, 1) column
        t1 = _gelu(pre1)
        dout = dpred[:, sl]
        dw2t_ref[:] += _dot(dout, t1.T)
        db2_ref[:] += _sum_cols(dout)   # (Co, 1), ones contraction
        dt1 = _dot(w2t_ref[:].T, dout)
        dpre1 = dt1 * _gelu_grad(pre1)
        dw1t_ref[:] += _dot(dpre1, bbc.T)
        db1_ref[:] += _sum_cols(dpre1)  # (H, 1)
        dbb_ref[0, :, sl] = _dot(w1t_ref[:].T, dpre1)


def _bb_bwd_kernel(dbb_ref, pre_ref, win_ref, grid_ref, stats_ref,
                   wmr_ref, wmi_ref, pw_ref, w0t_ref, facs_refs,
                   dpre_ref, dw0t_ref, db0_ref, dh_scr):
    b = pl.program_id(0)
    i = pl.program_id(1)
    layer = L_LAYERS - 1 - i
    f = SpectralFactors(*(r[:] for r in facs_refs))
    c, hp, wp = dh_scr.shape
    xx, yy = dbb_ref.shape[3], dbb_ref.shape[4]

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros((c, hp, wp), jnp.float32)
        dh_scr[:, :xx, :yy] = dbb_ref[0, 0]

    pre = pre_ref[0, 0]
    dh, dpre = _layer_bwd_data_el(
        dh_scr[:], pre, wmr_ref[0], wmi_ref[0], pw_ref[0], f,
        last=(layer == L_LAYERS - 1),
    )
    dpre_ref[0, 0] = dpre
    dh_scr[:] = dh

    @pl.when(i == L_LAYERS - 1)
    def _():
        # dh is now the cotangent of the padded fc0 output
        dh0 = dh_scr[:, :xx, :yy].reshape(c, xx * yy)
        st = stats_ref[0]                      # (Cc, 2)
        mean = st[:, 0:1][None, :, :, None]    # back to (1, Cc, 1, 1)
        std = st[:, 1:2][None, :, :, None]
        inp = _prep_el(win_ref[0], grid_ref[:], mean, std)
        finp = inp.reshape(inp.shape[0], -1)

        @pl.when(b == 0)
        def _():
            dw0t_ref[:] = jnp.zeros_like(dw0t_ref)
            db0_ref[:] = jnp.zeros_like(db0_ref)

        dw0t_ref[:] += _dot(dh0, finp.T)
        db0_ref[:] += _sum_cols(dh0)  # (C, 1), ones contraction


def _bb_wgrad_kernel(pre_prev_ref, h0p_ref, dpre_ref, wmr_ref, wmi_ref,
                     facs_refs, dwmr_ref, dwmi_ref, dpw_ref, dpbt_ref):
    layer = pl.program_id(0)
    b = pl.program_id(1)
    f = SpectralFactors(*(r[:] for r in facs_refs))
    h = jnp.where(layer == 0, h0p_ref[0], _gelu(pre_prev_ref[0, 0]))
    dwmr, dwmi, dpw, dpb = _layer_wgrad_el(
        h, dpre_ref[0, 0], wmr_ref[0], wmi_ref[0], f
    )

    @pl.when(b == 0)
    def _():
        dwmr_ref[0] = jnp.zeros_like(dwmr_ref[0])
        dwmi_ref[0] = jnp.zeros_like(dwmi_ref[0])
        dpw_ref[0] = jnp.zeros_like(dpw_ref[0])

    # dpb accumulates in the FULL (O, L) transposed buffer (block rule,
    # see _bb_fwd_kernel).  The grid is (L, B) with B innermost, so the
    # very first program is (layer 0, b 0): zero the whole buffer there,
    # then every program adds its column as a one-hot outer product —
    # full-block static-shape ops only (a dynamic lane-dim slice store
    # would lean on minor-dim dynamic indexing support).
    @pl.when(jnp.logical_and(layer == 0, b == 0))
    def _():
        dpbt_ref[:] = jnp.zeros_like(dpbt_ref)

    onehot_row = (jax.lax.broadcasted_iota(jnp.int32, (1, L_LAYERS), 1)
                  == layer).astype(jnp.float32)
    dwmr_ref[0] += dwmr
    dwmi_ref[0] += dwmi
    dpw_ref[0] += dpw
    dpbt_ref[:] += dpb * onehot_row  # (O,1)*(1,L) -> only column `layer`


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------


def _facs_arrays(hp, wp, m1, m2):
    return tuple(jnp.asarray(a) for a in spectral_factors(hp, wp, m1, m2))


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd, memory_space=pltpu.VMEM)


def _bb_forward(win, grid2, p: FastFNOParams, m1, m2, pad):
    b, t, cc, xx, yy = win.shape
    hpad, wpad = _pad8(xx + pad), _pad128(yy + pad)  # physical field dims
    c = p.w0t.shape[0]
    facs = _facs_arrays(xx + pad, yy + pad, m1, m2)
    n_facs = len(facs)

    def kernel(*refs):
        win_r, grid_r, wmr_r, wmi_r, pw_r, pbt_r, w0t_r, b0_r = refs[:8]
        f_rs = refs[8:8 + n_facs]
        pre_r, bbout_r, stats_r, h0p_r = refs[8 + n_facs:8 + n_facs + 4]
        h_scr = refs[-1]
        _bb_fwd_kernel(win_r, grid_r, wmr_r, wmi_r, pw_r, pbt_r, w0t_r, b0_r,
                       f_rs, pre_r, bbout_r, stats_r, h0p_r, h_scr)

    in_specs = [
        pl.BlockSpec((1, t, cc, xx, yy), lambda bb_, i: (bb_, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec(grid2.shape),
        pl.BlockSpec((1,) + p.wmr.shape[1:], lambda bb_, i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + p.wmi.shape[1:], lambda bb_, i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + p.pw.shape[1:], lambda bb_, i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        _const_spec((p.pb.shape[1], L_LAYERS)),  # pb TRANSPOSED (O, L)
        _const_spec(p.w0t.shape),
        _const_spec((p.b0.shape[0], 1)),         # b0 as (C, 1) column
    ] + [_const_spec(a.shape) for a in facs]
    out_shape = [
        jax.ShapeDtypeStruct((b, L_LAYERS, c, hpad, wpad), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, c, xx, yy), jnp.float32),   # bbout
        jax.ShapeDtypeStruct((b, cc, 2), jnp.float32),          # stats
        jax.ShapeDtypeStruct((b, c, hpad, wpad), jnp.float32),  # h0p
    ]
    out_specs = [
        pl.BlockSpec((1, 1, c, hpad, wpad), lambda bb_, i: (bb_, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c, xx, yy), lambda bb_, i: (bb_, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cc, 2), lambda bb_, i: (bb_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, hpad, wpad), lambda bb_, i: (bb_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    pre, bbout, stats, h0p = pl.pallas_call(
        kernel,
        grid=(b, L_LAYERS),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((c, hpad, wpad), jnp.float32)],
        interpret=_use_interpret(),
    )(win, grid2, p.wmr, p.wmi, p.pw, p.pb.T, p.w0t, p.b0[:, None], *facs)
    return pre, bbout[:, 0], stats, h0p


def _head_forward(bbout, stats, p: FastFNOParams, n_chunks=4):
    b, c, xx, yy = bbout.shape
    co = p.w2t.shape[0]
    if (xx * yy) % n_chunks:  # ADVICE r4: fail loud, not silent tail drop
        raise ValueError(
            f"head kernels chunk the {xx}x{yy} spatial axis into "
            f"{n_chunks} slices; {xx * yy} % {n_chunks} != 0"
        )
    kernel = functools.partial(_head_fwd_kernel, n_chunks=n_chunks)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, xx, yy), lambda bb_: (bb_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + stats.shape[1:], lambda bb_: (bb_, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(p.w1t.shape),
            _const_spec((p.b1.shape[0], 1)),
            _const_spec(p.w2t.shape),
            _const_spec((p.b2.shape[0], 1)),
        ],
        out_specs=pl.BlockSpec((1, co, xx * yy), lambda bb_: (bb_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, co, xx * yy), jnp.float32),
        interpret=_use_interpret(),
    )(bbout, stats, p.w1t, p.b1[:, None], p.w2t, p.b2[:, None]).reshape(
        b, co, xx, yy)


def _head_backward(dpred, bbout, stats, p: FastFNOParams, n_chunks=4):
    b, c, xx, yy = bbout.shape
    co = dpred.shape[1]
    nh = p.w1t.shape[0]
    if (xx * yy) % n_chunks:  # ADVICE r4: fail loud, not silent tail drop
        raise ValueError(
            f"head kernels chunk the {xx}x{yy} spatial axis into "
            f"{n_chunks} slices; {xx * yy} % {n_chunks} != 0"
        )
    kernel = functools.partial(_head_bwd_kernel, n_chunks=n_chunks)
    dbb, dw1t, db1, dw2t, db2 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, co, xx * yy), lambda bb_: (bb_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, xx, yy), lambda bb_: (bb_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + stats.shape[1:], lambda bb_: (bb_, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(p.w1t.shape),
            _const_spec((nh, 1)),
            _const_spec(p.w2t.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, c, xx * yy), lambda bb_: (bb_, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(p.w1t.shape),
            _const_spec((nh, 1)),
            _const_spec(p.w2t.shape),
            _const_spec((co, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, xx * yy), jnp.float32),
            jax.ShapeDtypeStruct(p.w1t.shape, jnp.float32),
            jax.ShapeDtypeStruct((nh, 1), jnp.float32),
            jax.ShapeDtypeStruct(p.w2t.shape, jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(dpred.reshape(b, co, xx * yy), bbout, stats, p.w1t, p.b1[:, None],
      p.w2t)
    return dbb.reshape(b, c, xx, yy), dw1t, db1[:, 0], dw2t, db2[:, 0]


def _bb_backward(dbb, pre, win, grid2, stats, p: FastFNOParams, m1, m2, pad):
    b, t, cc, xx, yy = win.shape
    hpad, wpad = _pad8(xx + pad), _pad128(yy + pad)
    c = p.w0t.shape[0]
    facs = _facs_arrays(xx + pad, yy + pad, m1, m2)
    n_facs = len(facs)

    def kernel(*refs):
        dbb_r, pre_r, win_r, grid_r, stats_r, wmr_r, wmi_r, pw_r, w0t_r = refs[:9]
        f_rs = refs[9:9 + n_facs]
        dpre_r, dw0t_r, db0_r = refs[9 + n_facs:9 + n_facs + 3]
        dh_scr = refs[-1]
        _bb_bwd_kernel(dbb_r, pre_r, win_r, grid_r, stats_r, wmr_r, wmi_r,
                       pw_r, w0t_r, f_rs, dpre_r, dw0t_r, db0_r, dh_scr)

    # layer weights walked in REVERSE: block l = L-1-i
    rev = lambda bb_, i: (L_LAYERS - 1 - i, 0, 0, 0, 0)
    rev3 = lambda bb_, i: (L_LAYERS - 1 - i, 0, 0)
    dpre, dw0t, db0 = pl.pallas_call(
        kernel,
        grid=(b, L_LAYERS),
        in_specs=[
            pl.BlockSpec((1, 1, c, xx, yy), lambda bb_, i: (bb_, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, hpad, wpad),
                         lambda bb_, i: (bb_, L_LAYERS - 1 - i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, cc, xx, yy), lambda bb_, i: (bb_, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(grid2.shape),
            pl.BlockSpec((1, cc, 2), lambda bb_, i: (bb_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p.wmr.shape[1:], rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p.wmi.shape[1:], rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p.pw.shape[1:], rev3, memory_space=pltpu.VMEM),
            _const_spec(p.w0t.shape),
        ] + [_const_spec(a.shape) for a in facs],
        out_specs=[
            pl.BlockSpec((1, 1, c, hpad, wpad),
                         lambda bb_, i: (bb_, L_LAYERS - 1 - i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(p.w0t.shape),
            _const_spec((c, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, L_LAYERS, c, hpad, wpad), jnp.float32),
            jax.ShapeDtypeStruct(p.w0t.shape, jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((c, hpad, wpad), jnp.float32)],
        interpret=_use_interpret(),
    )(dbb[:, None], pre, win, grid2, stats, p.wmr, p.wmi, p.pw, p.w0t, *facs)
    return dpre, dw0t, db0[:, 0]


def _bb_weight_grads(pre, h0p, dpre, p: FastFNOParams, m1, m2, pad, xx, yy):
    b = pre.shape[0]
    c, hpad, wpad = pre.shape[2:]
    facs = _facs_arrays(xx + pad, yy + pad, m1, m2)
    n_facs = len(facs)

    def kernel(*refs):
        pre_prev_r, h0p_r, dpre_r, wmr_r, wmi_r = refs[:5]
        f_rs = refs[5:5 + n_facs]
        dwmr_r, dwmi_r, dpw_r, dpbt_r = refs[5 + n_facs:]
        _bb_wgrad_kernel(pre_prev_r, h0p_r, dpre_r, wmr_r, wmi_r, f_rs,
                         dwmr_r, dwmi_r, dpw_r, dpbt_r)

    # layer l >= 1 reads pre[b, l-1] (its input is gelu of the previous
    # layer's pre-activation); l == 0 loads pre[b, 0] as a dummy and the
    # kernel selects h0p instead
    lsel = lambda l, bb_: (bb_, jnp.maximum(l - 1, 0), 0, 0, 0)
    w5 = lambda l, bb_: (l, 0, 0, 0, 0)
    dwmr, dwmi, dpw, dpbt = pl.pallas_call(
        kernel,
        grid=(L_LAYERS, b),
        in_specs=[
            pl.BlockSpec((1, 1, c, hpad, wpad), lsel, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hpad, wpad), lambda l, bb_: (bb_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, hpad, wpad),
                         lambda l, bb_: (bb_, l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p.wmr.shape[1:], w5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p.wmi.shape[1:], w5, memory_space=pltpu.VMEM),
        ] + [_const_spec(a.shape) for a in facs],
        out_specs=[
            pl.BlockSpec((1,) + p.wmr.shape[1:], w5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p.wmi.shape[1:], w5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + p.pw.shape[1:], lambda l, bb_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec((p.pb.shape[1], L_LAYERS)),  # dpb TRANSPOSED (O, L)
        ],
        out_shape=[
            jax.ShapeDtypeStruct(p.wmr.shape, jnp.float32),
            jax.ShapeDtypeStruct(p.wmi.shape, jnp.float32),
            jax.ShapeDtypeStruct(p.pw.shape, jnp.float32),
            jax.ShapeDtypeStruct((p.pb.shape[1], L_LAYERS), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(pre, h0p, dpre, p.wmr, p.wmi, *facs)
    return dwmr, dwmi, dpw, dpbt.T


# --------------------------------------------------------------------------
# Whole-model megakernels (ONE pallas_call per direction)
#
# This backend VMEM-stack-allocates a pallas custom-call's FULL inputs
# and outputs (round-5 probes: 'Ran out of memory in memory space vmem
# while allocating on stack' for the 44.6 MB `pre` spill), so activation
# spills cannot cross the kernel boundary at the flagship shape.  The
# megakernel design never spills: the forward runs the whole model per
# batch element inside VMEM and emits only `pred` (~14 MB total I/O);
# the backward RECOMPUTES the forward in VMEM scratch (classic
# rematerialisation — the fwd matmul time is a minor share of the step)
# and emits only the ten weight-gradient buffers (~8 MB).  Static layer
# unroll: weights index with python ints, so no one-hot selects and no
# per-layer grid streaming.
# --------------------------------------------------------------------------


def _head_cols(x5):
    """(mean, std) de-norm columns, stop-gradient by construction."""
    return _stats_cols(x5)


def _full_fwd_kernel(win_ref, grid_ref, wmr_ref, wmi_ref, pw_ref, pbt_ref,
                     w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                     facs_refs, pred_ref, h_scr, *, xx, yy, n_chunks):
    f = SpectralFactors(*(r[:] for r in facs_refs))
    c, hpad, wpad = h_scr.shape
    hw = xx * yy
    ck = hw // n_chunks
    x5 = win_ref[0]
    mean_col, std_col = _stats_cols(x5)
    mean4 = mean_col[None, :, :, None]
    std4 = std_col[None, :, :, None]
    inp = _prep_el(x5, grid_ref[:], mean4, std4)
    finp = inp.reshape(inp.shape[0], -1)
    h0 = (_dot(w0t_ref[:], finp) + b0_ref[:]).reshape(c, xx, yy)
    h_scr[:] = jnp.zeros((c, hpad, wpad), jnp.float32)
    h_scr[:, :xx, :yy] = h0
    for i in range(L_LAYERS):
        h = h_scr[:]
        s, _ = _spectral_fwd_el(h, wmr_ref[i], wmi_ref[i], f)
        pcv = _dot(pw_ref[i].T, h.reshape(c, -1)).reshape(s.shape)
        pre = s + pcv + pbt_ref[:, i:i + 1][:, :, None]
        h_scr[:] = pre if i == L_LAYERS - 1 else _gelu(pre)
    bb = h_scr[:, :xx, :yy].reshape(c, hw)
    for j in range(n_chunks):
        sl = slice(j * ck, (j + 1) * ck)
        t1 = _gelu(_dot(w1t_ref[:], bb[:, sl]) + b1_ref[:])
        outn = _dot(w2t_ref[:], t1) + b2_ref[:]
        pred_ref[0, :, sl] = outn * std_col + mean_col


def _full_bwd_kernel(win_ref, grid_ref, dpred_ref, wmr_ref, wmi_ref, pw_ref,
                     pbt_ref, w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref,
                     facs_refs,
                     dwmr_ref, dwmi_ref, dpw_ref, dpbt_ref, dw0t_ref,
                     db0_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref,
                     h_scr, dh_scr, pre_scr, br_scr, bi_scr,
                     *, xx, yy, n_chunks):
    b = pl.program_id(0)
    f = SpectralFactors(*(r[:] for r in facs_refs))
    c, hpad, wpad = h_scr.shape
    co = dpred_ref.shape[1]
    hw = xx * yy
    ck = hw // n_chunks

    @pl.when(b == 0)
    def _():
        dwmr_ref[:] = jnp.zeros_like(dwmr_ref)
        dwmi_ref[:] = jnp.zeros_like(dwmi_ref)
        dpw_ref[:] = jnp.zeros_like(dpw_ref)
        dpbt_ref[:] = jnp.zeros_like(dpbt_ref)
        dw0t_ref[:] = jnp.zeros_like(dw0t_ref)
        db0_ref[:] = jnp.zeros_like(db0_ref)
        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # ---- forward recompute (stores pre_i + corner spectra in VMEM) ----
    # pre_scr/br_scr/bi_scr carry the kernel's rematerialisation dtype
    # (bf16 under the shipped DEFAULT precision — activation
    # checkpointing in bf16; exact f32 under `highest`): stores downcast,
    # reads promote back to f32 arithmetic
    x5 = win_ref[0]
    mean_col, std_col = _stats_cols(x5)
    mean4 = mean_col[None, :, :, None]
    std4 = std_col[None, :, :, None]
    inp = _prep_el(x5, grid_ref[:], mean4, std4)
    finp = inp.reshape(inp.shape[0], -1)
    h0 = (_dot(w0t_ref[:], finp) + b0_ref[:]).reshape(c, xx, yy)
    h_scr[:] = jnp.zeros((c, hpad, wpad), jnp.float32)
    h_scr[:, :xx, :yy] = h0
    sdt = pre_scr.dtype
    for i in range(L_LAYERS):
        h = h_scr[:]
        s, (br, bi) = _spectral_fwd_el(h, wmr_ref[i], wmi_ref[i], f)
        br_scr[i] = br.astype(sdt)
        bi_scr[i] = bi.astype(sdt)
        pcv = _dot(pw_ref[i].T, h.reshape(c, -1)).reshape(s.shape)
        pre = s + pcv + pbt_ref[:, i:i + 1][:, :, None]
        pre_scr[i] = pre.astype(sdt)
        h_scr[:] = pre if i == L_LAYERS - 1 else _gelu(pre)

    # ---- head forward-recompute + backward, spatially chunked ---------
    # chunk j covers whole image ROWS [j*rk, (j+1)*rk), so the dbb
    # cotangent writes straight into dh_scr's logical region (the
    # separate (C, HW) staging scratch was ~1.2 MB of the VMEM budget)
    rk = (xx // n_chunks)
    bb = h_scr[:, :xx, :yy].reshape(c, hw)
    dpred = dpred_ref[0].reshape(co, hw) * std_col
    dh_scr[:] = jnp.zeros((c, hpad, wpad), jnp.float32)
    for j in range(n_chunks):
        sl = slice(j * ck, (j + 1) * ck)
        bbc = bb[:, sl]
        pre1 = _dot(w1t_ref[:], bbc) + b1_ref[:]
        t1 = _gelu(pre1)
        dout = dpred[:, sl]
        dw2t_ref[:] += _dot(dout, t1.T)
        db2_ref[:] += _sum_cols(dout)
        dt1 = _dot(w2t_ref[:].T, dout)
        dpre1 = dt1 * _gelu_grad(pre1)
        dw1t_ref[:] += _dot(dpre1, bbc.T)
        db1_ref[:] += _sum_cols(dpre1)
        dh_scr[:, j * rk:(j + 1) * rk, :yy] = _dot(
            w1t_ref[:].T, dpre1).reshape(c, rk, yy)

    # after the head pass h_scr's final-layer activation is dead: reuse
    # it to hold the (padded) lift output, recomputed from the live finp
    # (removes the dedicated h0 scratch, ~2.7 MB)
    h0b = (_dot(w0t_ref[:], finp) + b0_ref[:]).reshape(c, xx, yy)
    h_scr[:] = jnp.zeros((c, hpad, wpad), jnp.float32)
    h_scr[:, :xx, :yy] = h0b

    # ---- backbone backward walk (static reversed unroll) --------------
    for i in reversed(range(L_LAYERS)):
        pre = pre_scr[i]
        dh = dh_scr[:]
        dpre = dh if i == L_LAYERS - 1 else dh * _gelu_grad(pre)
        dh_spec, (dcr, dci) = _spectral_adj_el(
            dpre, wmr_ref[i], wmi_ref[i], f)
        br, bi = br_scr[i], bi_scr[i]
        dwmr_ref[i] += (br[:, None] * dcr[None] + bi[:, None] * dci[None])
        dwmi_ref[i] += (-bi[:, None] * dcr[None] + br[:, None] * dci[None])
        h_in = h_scr[:] if i == 0 else _gelu(pre_scr[i - 1])
        dpre_f = dpre.reshape(dpre.shape[0], -1)
        dpw_ref[i] += _dot(h_in.reshape(c, -1), dpre_f.T)
        dpbt_ref[:, i:i + 1] += _sum_cols(dpre_f)
        dh_scr[:] = dh_spec + _dot(pw_ref[i], dpre_f).reshape(c, hpad, wpad)

    # ---- lift gradient ------------------------------------------------
    dh0 = dh_scr[:, :xx, :yy].reshape(c, hw)
    dw0t_ref[:] += _dot(dh0, finp.T)
    db0_ref[:] += _sum_cols(dh0)


def _full_forward(win, grid2, p: FastFNOParams, m1, m2, pad, n_chunks=4):
    b, t, cc, xx, yy = win.shape
    hpad, wpad = _pad8(xx + pad), _pad128(yy + pad)
    c = p.w0t.shape[0]
    co = p.w2t.shape[0]
    if (xx * yy) % n_chunks:
        raise ValueError(f"{xx * yy} % {n_chunks} != 0")
    facs = _facs_arrays(xx + pad, yy + pad, m1, m2)
    n_facs = len(facs)

    def kernel(*refs):
        _full_fwd_kernel(*refs[:12], refs[12:12 + n_facs], refs[-2],
                         refs[-1], xx=xx, yy=yy, n_chunks=n_chunks)

    pred = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, cc, xx, yy), lambda bb_: (bb_, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(grid2.shape),
            _const_spec(p.wmr.shape),
            _const_spec(p.wmi.shape),
            _const_spec(p.pw.shape),
            _const_spec((p.pb.shape[1], L_LAYERS)),
            _const_spec(p.w0t.shape),
            _const_spec((p.b0.shape[0], 1)),
            _const_spec(p.w1t.shape),
            _const_spec((p.b1.shape[0], 1)),
            _const_spec(p.w2t.shape),
            _const_spec((p.b2.shape[0], 1)),
        ] + [_const_spec(a.shape) for a in facs],
        out_specs=pl.BlockSpec((1, co, xx * yy), lambda bb_: (bb_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, co, xx * yy), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, hpad, wpad), jnp.float32)],
        interpret=_use_interpret(),
    )(win, grid2, p.wmr, p.wmi, p.pw, p.pb.T, p.w0t, p.b0[:, None],
      p.w1t, p.b1[:, None], p.w2t, p.b2[:, None], *facs)
    return pred.reshape(b, co, xx, yy)


def _full_backward(dpred, win, grid2, p: FastFNOParams, m1, m2, pad,
                   n_chunks=4):
    b, t, cc, xx, yy = win.shape
    hpad, wpad = _pad8(xx + pad), _pad128(yy + pad)
    c = p.w0t.shape[0]
    co = dpred.shape[1]
    nh = p.w1t.shape[0]
    kp, rp = p.wmr.shape[3], p.wmr.shape[4]
    facs = _facs_arrays(xx + pad, yy + pad, m1, m2)
    n_facs = len(facs)

    if xx % n_chunks:
        raise ValueError(
            f"the bwd head pass chunks whole image rows: xx={xx} must be "
            f"divisible by n_chunks={n_chunks}"
        )

    def kernel(*refs):
        _full_bwd_kernel(*refs[:12], refs[12:12 + n_facs],
                         *refs[12 + n_facs:12 + n_facs + 10],
                         *refs[-5:], xx=xx, yy=yy, n_chunks=n_chunks)

    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, cc, xx, yy), lambda bb_: (bb_, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(grid2.shape),
            pl.BlockSpec((1, co, xx * yy), lambda bb_: (bb_, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(p.wmr.shape),
            _const_spec(p.wmi.shape),
            _const_spec(p.pw.shape),
            _const_spec((p.pb.shape[1], L_LAYERS)),
            _const_spec(p.w0t.shape),
            _const_spec((p.b0.shape[0], 1)),
            _const_spec(p.w1t.shape),
            _const_spec((p.b1.shape[0], 1)),
            _const_spec(p.w2t.shape),
        ] + [_const_spec(a.shape) for a in facs],
        out_specs=[
            _const_spec(p.wmr.shape),
            _const_spec(p.wmi.shape),
            _const_spec(p.pw.shape),
            _const_spec((p.pb.shape[1], L_LAYERS)),
            _const_spec(p.w0t.shape),
            _const_spec((c, 1)),
            _const_spec(p.w1t.shape),
            _const_spec((nh, 1)),
            _const_spec(p.w2t.shape),
            _const_spec((co, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(p.wmr.shape, jnp.float32),
            jax.ShapeDtypeStruct(p.wmi.shape, jnp.float32),
            jax.ShapeDtypeStruct(p.pw.shape, jnp.float32),
            jax.ShapeDtypeStruct((p.pb.shape[1], L_LAYERS), jnp.float32),
            jax.ShapeDtypeStruct(p.w0t.shape, jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct(p.w1t.shape, jnp.float32),
            jax.ShapeDtypeStruct((nh, 1), jnp.float32),
            jax.ShapeDtypeStruct(p.w2t.shape, jnp.float32),
            jax.ShapeDtypeStruct((co, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, hpad, wpad), jnp.float32),            # h_scr
            pltpu.VMEM((c, hpad, wpad), jnp.float32),            # dh_scr
            # rematerialisation stores in the dot dtype: bf16 under the
            # shipped DEFAULT precision (-5.9 MB of the VMEM budget),
            # exact f32 under `highest` (the equivalence-test regime)
            pltpu.VMEM((L_LAYERS, c, hpad, wpad), _dot_dtype()),  # pre_scr
            pltpu.VMEM((L_LAYERS, c, kp, rp), _dot_dtype()),      # br_scr
            pltpu.VMEM((L_LAYERS, c, kp, rp), _dot_dtype()),      # bi_scr
        ],
        interpret=_use_interpret(),
    )(win, grid2, dpred.reshape(b, co, xx * yy),
      p.wmr.astype(_dot_dtype()), p.wmi.astype(_dot_dtype()), p.pw,
      p.pb.T, p.w0t, p.b0[:, None], p.w1t, p.b1[:, None], p.w2t, *facs)
    dwmr, dwmi, dpw, dpbt, dw0t, db0, dw1t, db1, dw2t, db2 = outs
    return FastFNOParams(
        wmr=dwmr, wmi=dwmi, pw=dpw, pb=dpbt.T, w0t=dw0t, b0=db0[:, 0],
        w1t=dw1t, b1=db1[:, 0], w2t=dw2t, b2=db2[:, 0],
    )


# --------------------------------------------------------------------------
# The differentiable fused model apply
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fno2d_fused_apply(win, grid2, p: FastFNOParams, modes1, modes2, pad=2):
    """Fused FNO2d forward: win (B,T,Cc,X,Y), grid2 (G,X,Y) -> (B,Cc,X,Y).

    Differentiable in ``p`` (win/grid get zero cotangents — the window is
    data; instance-norm stats are stop-gradient per the reference).
    """
    return _full_forward(win, grid2, p, modes1, modes2, pad)


def _apply_fwd(win, grid2, p, modes1, modes2, pad):
    pred = _full_forward(win, grid2, p, modes1, modes2, pad)
    # residuals are INPUTS only: the backward megakernel rematerialises
    # the whole forward in VMEM (no activation spill may cross the
    # kernel boundary on this backend — see the section comment)
    return pred, (win, grid2, p)


def _apply_bwd(modes1, modes2, pad, res, dpred):
    win, grid2, p = res
    dp = _full_backward(dpred, win, grid2, p, modes1, modes2, pad)
    return jnp.zeros_like(win), jnp.zeros_like(grid2), dp


fno2d_fused_apply.defvjp(_apply_fwd, _apply_bwd)
