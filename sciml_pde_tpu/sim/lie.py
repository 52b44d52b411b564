"""Lie-point-symmetry augmentation for Navier-Stokes (pure jnp).

Capability parity with the reference's Lie-Trotter engine
(``pdebench/models/fno/transformations.py:17-179``) and its use in the
Lie-augmented FNO loader (``fno/utils_2d_ns_baseline_lie.py:47-90,161-209``):
nine one-parameter symmetry groups of the 2D incompressible NS equations
(time/x/y translation, scaling, rotation, linear and quadratic Galilean
boosts), composed with 2nd/higher-order Lie-Trotter splitting
exp(sum_i g_i X_i).

TPU-first: everything is jit/vmap-friendly, so augmentation runs *inside*
the jitted train step with per-window strengths drawn from ``jax.random``
(the reference draws numpy randoms per sample in DataLoader workers).

Note (matching the reference loader): the transforms act on coordinate and
velocity *values*; the loader keeps the transformed velocity channels and
discards the transformed coordinates (no resampling).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

# default strengths (reference utils_2d_ns_baseline_lie.py:13-23)
DEFAULT_STRENGTHS = (
    0.1,            # g1: time shift
    0.1,            # g2: x-translation
    0.1,            # g3: y-translation
    0.05,           # g4: scaling
    math.pi / 18,   # g5: rotation
    0.2,            # g6: x-Galilean boost
    0.2,            # g7: y-Galilean boost
    0.05,           # g8: x-quadratic boost
    0.05,           # g9: y-quadratic boost
)


# each group: (g, state) -> state with state = (t, x, y, u, v)
def _g1(g, s):
    t, x, y, u, v = s
    return (t + g, x, y, u, v)


def _g2(g, s):
    t, x, y, u, v = s
    return (t, x + g, y, u, v)


def _g3(g, s):
    t, x, y, u, v = s
    return (t, x, y + g, u, v)


def _g4(g, s):
    t, x, y, u, v = s
    e = jnp.exp(g)
    return (e * e * t, e * x, e * y, u / e, v / e)


def _g5(g, s):
    t, x, y, u, v = s
    c, sn = jnp.cos(g), jnp.sin(g)
    return (t, c * x - sn * y, sn * x + c * y, c * u - sn * v, sn * u + c * v)


def _g6(g, s):
    t, x, y, u, v = s
    return (t, x + g * t, y, u + g, v)


def _g7(g, s):
    t, x, y, u, v = s
    return (t, x, y + g * t, u, v + g)


def _g8(g, s):
    # quadratic boost, pressure-free variant (reference group_8 px=None branch)
    t, x, y, u, v = s
    return (t, x + g * t, y, u + g, v)


def _g9(g, s):
    t, x, y, u, v = s
    return (t, x, y + g * t * t, u, v + g)


NS_GROUPS: Sequence[Callable] = (_g1, _g2, _g3, _g4, _g5, _g6, _g7, _g8, _g9)


def lie_trotter_exp_2(state, strengths, factor=1.0):
    """Strang (2nd-order) splitting sweep: reversed half-steps then forward
    half-steps (reference transformations.py:17-35 with T=1)."""
    n = len(NS_GROUPS)
    for i in reversed(range(n)):
        state = NS_GROUPS[i](factor * strengths[i] / 2.0, state)
    for i in range(n):
        state = NS_GROUPS[i](factor * strengths[i] / 2.0, state)
    return state


def lie_trotter_exp(state, strengths, order: int = 2, steps: int = 1, factor: float = 1.0):
    """Higher-order Suzuki composition (reference transformations.py:38-65)."""
    if steps == 0:
        return state
    factor = factor / steps
    for _ in range(steps):
        if order == 2:
            state = lie_trotter_exp_2(state, strengths, factor=factor)
        elif order > 2:
            u_k = 1.0 / (4.0 - 4.0 ** (1.0 / (2 * order - 1)))
            for f in (u_k, u_k, 1 - 4 * u_k, u_k, u_k):
                state = lie_trotter_exp(state, strengths, order=order - 2, steps=1, factor=factor * f)
        elif order == 0:
            pass
        else:
            raise NotImplementedError(order)
    return state


def sample_strengths(key, max_strengths=DEFAULT_STRENGTHS):
    """g1 ~ U(0, s1); g_i ~ U(-s_i, s_i) for i>1 (reference loader :70-73)."""
    ks = jax.random.split(key, len(max_strengths))
    g1 = jax.random.uniform(ks[0], (), minval=0.0, maxval=max_strengths[0])
    rest = [
        jax.random.uniform(k, (), minval=-s, maxval=s)
        for k, s in zip(ks[1:], max_strengths[1:])
    ]
    return jnp.stack([g1, *rest])


def augment_ns_window(window: jnp.ndarray, key, order: int = 2, steps: int = 2):
    """Lie-augment one NS window.

    window: (X, Y, T, C>=3) with channels (u, v, particles, ...).
    Returns the window with u, v replaced by their transformed values
    (reference utils_2d_ns_baseline_lie.py:182-203: transformed coordinates
    are discarded, no resampling).
    """
    nx, ny, nt = window.shape[0], window.shape[1], window.shape[2]
    xs = jnp.linspace(0, 1, nx)[:, None, None]
    ys = jnp.linspace(0, 1, ny)[None, :, None]
    ts = jnp.linspace(0, 1, nt)[None, None, :]
    x = jnp.broadcast_to(xs, (nx, ny, nt))
    y = jnp.broadcast_to(ys, (nx, ny, nt))
    t = jnp.broadcast_to(ts, (nx, ny, nt))
    u = window[..., 0]
    v = window[..., 1]
    strengths = sample_strengths(key)
    _, _, _, u2, v2 = lie_trotter_exp((t, x, y, u, v), strengths, order=order, steps=steps)
    return jnp.concatenate(
        [u2[..., None], v2[..., None], window[..., 2:]], axis=-1
    )
