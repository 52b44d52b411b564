"""2D FitzHugh-Nagumo diffusion-reaction simulator, JAX-native.

Capability parity with the reference simulator
(``pdebench/data_gen/src/sim_diff_react.py:10-178``): finite-volume grid with
no-flux Neumann BCs, activator/inhibitor reaction terms, and the
``sim_type in {all, react, diff}`` decomposition knob that produces the
paper's "basic physics forms" auxiliary datasets.

TPU-first design:
  - the hand-built 5-diagonal sparse Laplacian (reference :94-125) becomes a
    5-point stencil with edge ("replicate") padding — algebraically the same
    Neumann operator, but a dense vectorized op that XLA fuses;
  - scipy ``solve_ivp`` RK45 (reference :125-129) becomes fixed-step RK4
    under ``lax.scan`` with an automatically chosen stability-bounded
    substep count — fully on-device, batched over seeds with ``vmap``, so
    training data can stream from TPU-resident simulation;
  - initial conditions still come from ``np.random.default_rng(seed)`` on
    the host so generated datasets are sample-for-sample comparable with the
    reference's (same seeds -> same ICs).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffReactConfig:
    """Defaults mirror the generation config the datasets were built with
    (reference ``data_gen/configs/diff-react.yaml:24-38``)."""

    Du: float = 1e-3
    Dv: float = 1e-1
    k: float = 5e-3
    t: float = 5.0
    tdim: int = 101
    x_left: float = -1.0
    x_right: float = 1.0
    xdim: int = 128
    y_bottom: float = -1.0
    y_top: float = 1.0
    ydim: int = 128
    sim_type: str = "all"  # all | react | diff

    @property
    def dx(self) -> float:
        return (self.x_right - self.x_left) / self.xdim

    @property
    def dy(self) -> float:
        return (self.y_top - self.y_bottom) / self.ydim

    @property
    def x(self) -> np.ndarray:
        return np.linspace(
            self.x_left + self.dx / 2, self.x_right - self.dx / 2, self.xdim
        ).astype(np.float32)

    @property
    def y(self) -> np.ndarray:
        return np.linspace(
            self.y_bottom + self.dy / 2, self.y_top - self.dy / 2, self.ydim
        ).astype(np.float32)

    @property
    def tgrid(self) -> np.ndarray:
        return np.linspace(0, self.t, self.tdim).astype(np.float32)


def initial_condition(seed: int, cfg: DiffReactConfig) -> np.ndarray:
    """Standard-normal IC, identical sample stream to the reference
    (sim_diff_react.py:82-89): u then v from ``default_rng(seed)``."""
    rng = np.random.default_rng(seed)
    u0 = rng.standard_normal(cfg.xdim * cfg.ydim).reshape(cfg.ydim, cfg.xdim)
    v0 = rng.standard_normal(cfg.xdim * cfg.ydim).reshape(cfg.ydim, cfg.xdim)
    return np.stack([u0, v0], axis=-1).astype(np.float32)


def laplacian_neumann(u: jnp.ndarray, inv_dx2: float, inv_dy2: float) -> jnp.ndarray:
    """5-point Laplacian with no-flux (zero-gradient) BCs on (..., Ny, Nx).

    Edge padding reproduces the reference's boundary-adjusted diagonals
    (sim_diff_react.py:94-125): at a wall the missing neighbour equals the
    cell itself, i.e. the one-sided second difference.
    """
    px = jnp.concatenate([u[..., :, :1], u, u[..., :, -1:]], axis=-1)
    lx = (px[..., :, 2:] - 2.0 * u + px[..., :, :-2]) * inv_dx2
    py = jnp.concatenate([u[..., :1, :], u, u[..., -1:, :]], axis=-2)
    ly = (py[..., 2:, :] - 2.0 * u + py[..., :-2, :]) * inv_dy2
    return lx + ly


def _rhs(state: jnp.ndarray, cfg: DiffReactConfig) -> jnp.ndarray:
    """FitzHugh-Nagumo RHS on (..., Ny, Nx, 2); sim_type selects the full
    equation or a decomposed basic form (reference :140-178)."""
    u, v = state[..., 0], state[..., 1]
    inv_dx2 = 1.0 / cfg.dx**2
    inv_dy2 = 1.0 / cfg.dy**2

    if cfg.sim_type == "all":
        u_t = (u - u**3 - cfg.k - v) + cfg.Du * laplacian_neumann(u, inv_dx2, inv_dy2)
        v_t = (u - v) + cfg.Dv * laplacian_neumann(v, inv_dx2, inv_dy2)
    elif cfg.sim_type == "react":
        u_t = u - u**3 - cfg.k - v
        v_t = u - v
    elif cfg.sim_type == "diff":
        u_t = cfg.Du * laplacian_neumann(u, inv_dx2, inv_dy2)
        v_t = cfg.Dv * laplacian_neumann(v, inv_dx2, inv_dy2)
    else:
        raise ValueError(f"unknown sim_type {cfg.sim_type!r}")
    return jnp.stack([u_t, v_t], axis=-1)


def stability_substeps(cfg: DiffReactConfig, safety: float = 0.5) -> int:
    """Substeps per output frame keeping RK4 inside its stability region.

    Explicit diffusion eigenvalue bound: 4*D*(1/dx^2 + 1/dy^2); RK4 real-axis
    stability limit ~2.785.
    """
    # reaction Jacobian bound: |1 - 3u^2| with standard-normal ICs (|u|<~3.7)
    lam_react = 40.0
    if cfg.sim_type == "react":
        lam = lam_react
    elif cfg.sim_type == "diff":
        lam = 4.0 * max(cfg.Du, cfg.Dv) * (1.0 / cfg.dx**2 + 1.0 / cfg.dy**2)
    else:
        lam = 4.0 * max(cfg.Du, cfg.Dv) * (1.0 / cfg.dx**2 + 1.0 / cfg.dy**2) + lam_react
    dt_frame = cfg.t / (cfg.tdim - 1)
    dt_max = safety * 2.785 / lam
    return max(1, math.ceil(dt_frame / dt_max))


@functools.partial(jax.jit, static_argnames=("cfg", "substeps"))
def simulate_diff_react(
    ic: jnp.ndarray, cfg: DiffReactConfig, substeps: int | None = None
) -> jnp.ndarray:
    """Integrate one (or a batch of) trajectories.

    Args:
      ic: (..., Ny, Nx, 2) initial state.
    Returns: (tdim, ..., Ny, Nx, 2) including the initial frame.
    """
    if substeps is None:
        substeps = stability_substeps(cfg)
    dt = cfg.t / (cfg.tdim - 1) / substeps

    def rk4(s, _):
        k1 = _rhs(s, cfg)
        k2 = _rhs(s + 0.5 * dt * k1, cfg)
        k3 = _rhs(s + 0.5 * dt * k2, cfg)
        k4 = _rhs(s + dt * k3, cfg)
        return s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    def frame(s, _):
        s, _ = jax.lax.scan(rk4, s, None, length=substeps)
        return s, s

    _, traj = jax.lax.scan(frame, jnp.asarray(ic, jnp.float32), None, length=cfg.tdim - 1)
    return jnp.concatenate([jnp.asarray(ic, jnp.float32)[None], traj], axis=0)


def generate_trajectories(
    seeds: list[int], cfg: DiffReactConfig, substeps: int | None = None
) -> np.ndarray:
    """Batched generation: (len(seeds), tdim, Ny, Nx, 2)."""
    ics = np.stack([initial_condition(s, cfg) for s in seeds])
    sim = jax.vmap(lambda x: simulate_diff_react(x, cfg, substeps))
    return np.asarray(sim(jnp.asarray(ics)))
