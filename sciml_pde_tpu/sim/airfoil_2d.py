"""2D compressible flow around an airfoil — real generator for the
airfoil point-cloud suite.

The reference trains its irregular spatio-temporal OFormer on the
meshgraphnets airfoil dataset (``OFormer Model Comparison/airfoil/
dataset_new.py:550-640``): per-sample ``.npz`` files holding a FIXED
scattered node set (``pos``), integer ``node_type`` in {0: fluid,
2: airfoil surface, 4: open/far-field boundary}, triangle ``cells``, and
evolving ``dns`` / ``prs`` / ``vel`` node states at aerodynamic scales
(density ~1.2 kg/m^3, pressure ~1e5 Pa, speeds ~160 m/s — the loader's
``af_train_data_statistics.npz``).  The dataset itself is a proprietary
download, so the reference ships no generator; this module produces the
same protocol (npz keys, raw node-type codes, channel scales, statistics
file) from a real simulation.

Physics: 2D compressible Euler, finite-volume Rusanov (local
Lax-Friedrichs) fluxes with MUSCL/minmod reconstruction, SSP-RK2 in
time, Brinkman volume penalization for the solid NACA body (momentum and
energy relaxed toward a zero-velocity state inside the mask), and a
far-field sponge that relaxes toward free-stream to absorb outgoing
waves.  Each sample varies the free-stream Mach number, angle of attack
and NACA camber/thickness.

TPU-first design: the solver state is a dense (4, H, W) conservative
array advanced by a ``lax.scan`` of fused stencil updates — no
unstructured mesh in the hot loop.  The irregular node cloud exists only
at the I/O boundary: nodes are sampled FEM-like (surface ring + wake/
near-body refinement + far-field box), and node states are gathered by
bilinear interpolation from the saved frames, batched over frames on
device.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

GAMMA = 1.4


# --------------------------------------------------------------------------
# NACA geometry
# --------------------------------------------------------------------------


def naca4_polyline(
    camber: float, camber_pos: float, thickness: float, n: int = 200
) -> np.ndarray:
    """Closed surface polyline of a NACA 4-digit airfoil, chord 1, nose at
    origin, trailing edge at (1, 0).  ``camber``/``thickness`` are chord
    fractions (e.g. 0.02 / 0.12 for NACA 2412), ``camber_pos`` in (0, 1)."""
    beta = np.linspace(0.0, np.pi, n)
    x = 0.5 * (1.0 - np.cos(beta))  # cosine spacing, fine at nose/tail
    yt = 5.0 * thickness * (
        0.2969 * np.sqrt(x)
        - 0.1260 * x
        - 0.3516 * x**2
        + 0.2843 * x**3
        - 0.1036 * x**4  # closed trailing edge variant
    )
    m, p = camber, max(camber_pos, 1e-6)
    yc = np.where(
        x < p,
        m / p**2 * (2 * p * x - x**2),
        m / (1 - p) ** 2 * ((1 - 2 * p) + 2 * p * x - x**2),
    )
    dyc = np.where(
        x < p, 2 * m / p**2 * (p - x), 2 * m / (1 - p) ** 2 * (p - x)
    )
    th = np.arctan(dyc)
    xu, yu = x - yt * np.sin(th), yc + yt * np.cos(th)
    xl, yl = x + yt * np.sin(th), yc - yt * np.cos(th)
    # upper surface nose->tail, then lower tail->nose (closed loop)
    pts = np.concatenate(
        [np.stack([xu, yu], 1), np.stack([xl, yl], 1)[::-1][1:-1]], axis=0
    )
    return pts.astype(np.float64)


def _point_segment_dist(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min distance from points p (N,2) to segments a->b (M,2)."""
    ab = b - a  # (M,2)
    ap = p[:, None, :] - a[None]  # (N,M,2)
    denom = (ab**2).sum(-1)[None]  # (1,M)
    t = np.clip((ap * ab[None]).sum(-1) / np.maximum(denom, 1e-12), 0.0, 1.0)
    closest = a[None] + t[..., None] * ab[None]
    return np.sqrt(((p[:, None, :] - closest) ** 2).sum(-1)).min(axis=1)


def airfoil_mask_and_distance(
    poly: np.ndarray, pts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(inside mask, unsigned distance to surface) for points (N, 2)."""
    from matplotlib.path import Path as MplPath

    inside = MplPath(poly).contains_points(pts)
    d = _point_segment_dist(pts, poly, np.roll(poly, -1, axis=0))
    return inside, d


def place_airfoil(
    poly: np.ndarray, aoa_deg: float, chord: float = 1.0
) -> np.ndarray:
    """Rotate by -aoa (flow along +x), scale to chord, center at origin."""
    c, s = np.cos(np.deg2rad(-aoa_deg)), np.sin(np.deg2rad(-aoa_deg))
    rot = np.array([[c, -s], [s, c]])
    return (poly - np.array([0.4, 0.0])) @ rot.T * chord


# --------------------------------------------------------------------------
# compressible Euler FV solver
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AirfoilConfig:
    nx: int = 384
    ny: int = 384
    extent: float = 6.0  # domain [-extent, extent]^2, chord 1
    rho_inf: float = 1.204
    p_inf: float = 99_300.0
    mach: float = 0.47
    aoa_deg: float = 2.0
    camber: float = 0.02
    camber_pos: float = 0.4
    thickness: float = 0.12
    cfl: float = 0.35
    eta_penal: float = 8.0  # penalization rate multiplier (1/dt units)
    sponge_width: float = 1.2  # in length units from each edge
    sponge_rate: float = 40.0  # 1/s at the outer edge
    n_frames: int = 101
    frame_dt: float = 2.0e-3  # seconds between saved frames
    settle_time: float = 5.0e-2  # seconds discarded before frame 0

    @property
    def dx(self) -> float:
        return 2.0 * self.extent / self.nx

    @property
    def a_inf(self) -> float:
        return float(np.sqrt(GAMMA * self.p_inf / self.rho_inf))

    @property
    def v_inf(self) -> float:
        return self.mach * self.a_inf

    @property
    def dt(self) -> float:
        vmax = self.v_inf + 1.8 * self.a_inf
        return self.cfl * self.dx / vmax


def _primitive(U):
    rho = U[0]
    u = U[1] / rho
    v = U[2] / rho
    p = (GAMMA - 1.0) * (U[3] - 0.5 * rho * (u * u + v * v))
    return rho, u, v, p


def _flux_x(U):
    rho, u, v, p = _primitive(U)
    return jnp.stack([rho * u, rho * u * u + p, rho * u * v, u * (U[3] + p)])


def _flux_y(U):
    rho, u, v, p = _primitive(U)
    return jnp.stack([rho * v, rho * u * v, rho * v * v + p, v * (U[3] + p)])


def _wavespeed(U):
    rho, u, v, p = _primitive(U)
    a = jnp.sqrt(GAMMA * jnp.maximum(p, 1e-3) / rho)
    return jnp.sqrt(u * u + v * v) + a


def _minmod(a, b):
    return jnp.where(a * b > 0.0, jnp.where(jnp.abs(a) < jnp.abs(b), a, b), 0.0)


def _edge_states(U, axis):
    """MUSCL/minmod left/right states at interior interfaces along axis."""
    d = jnp.diff(U, axis=axis)

    def sl(lo, hi):
        idx = [slice(None)] * U.ndim
        idx[axis] = slice(lo, hi)
        return tuple(idx)

    slope = _minmod(d[sl(None, -1)], d[sl(1, None)])  # slopes at cells 1..n-2
    # interface i+1/2 for i = 1..n-3 uses cells i (left) and i+1 (right)
    UL = U[sl(1, -2)] + 0.5 * slope[sl(None, -1)]
    UR = U[sl(2, -1)] - 0.5 * slope[sl(1, None)]
    return UL, UR


def _rusanov(UL, UR, flux):
    lam = jnp.maximum(_wavespeed(UL), _wavespeed(UR))[None]
    return 0.5 * (flux(UL) + flux(UR)) - 0.5 * lam * (UR - UL)


def make_step(cfg: AirfoilConfig, chi: jnp.ndarray, sponge: jnp.ndarray,
              U_inf: jnp.ndarray):
    """One SSP-RK2 Euler step with penalization + sponge.

    chi: (H, W) solid mask in [0,1]; sponge: (H, W) relaxation rate (1/s);
    U_inf: (4,) free-stream conservative state.
    """
    dx = cfg.dx
    dt = cfg.dt

    def rhs(U):
        # pad with free-stream ghosts (sponge handles physics at edges)
        Ug = jnp.pad(U, ((0, 0), (2, 2), (2, 2)), mode="edge")
        # x-direction (axis 1 of padded array)
        UL, UR = _edge_states(Ug, 1)
        Fx = _rusanov(UL, UR, _flux_x)  # interfaces between padded cells
        dFx = (Fx[:, 1:, :] - Fx[:, :-1, :])[:, :, 2:-2] / dx
        UL, UR = _edge_states(Ug, 2)
        Fy = _rusanov(UL, UR, _flux_y)
        dFy = (Fy[:, :, 1:] - Fy[:, :, :-1])[:, 2:-2, :] / dx
        return -(dFx + dFy)

    # zero-velocity, free-stream-pressure target inside the body
    rho_i, p_i = U_inf[0], (GAMMA - 1.0) * U_inf[3] - 0.5 * 0.0
    p_inf = cfg.p_inf
    U_solid = jnp.array([cfg.rho_inf, 0.0, 0.0, p_inf / (GAMMA - 1.0)])

    k_pen = cfg.eta_penal / dt  # fast relaxation inside the body

    def relax(U):
        rate = (k_pen * chi + sponge)[None]
        target = (
            chi[None] * U_solid[:, None, None]
            + (1.0 - chi)[None] * U_inf[:, None, None]
        )
        # implicit (unconditionally stable) relaxation toward target
        f = rate * dt
        return (U + f * target) / (1.0 + f)

    @jax.jit
    def step(U):
        U1 = U + dt * rhs(U)
        U2 = 0.5 * (U + U1 + dt * rhs(U1))
        return relax(U2)

    return step


def freestream_state(cfg: AirfoilConfig) -> np.ndarray:
    u = cfg.v_inf
    E = cfg.p_inf / (GAMMA - 1.0) + 0.5 * cfg.rho_inf * u * u
    return np.array([cfg.rho_inf, cfg.rho_inf * u, 0.0, E], np.float32)


def simulate(cfg: AirfoilConfig, smooth_cells: int = 2):
    """Run the solve; returns (frames, chi, grid_xy).

    frames: (n_frames, 4, H, W) primitive fields [rho, u, v, p].
    """
    xs = np.linspace(-cfg.extent + cfg.dx / 2, cfg.extent - cfg.dx / 2, cfg.nx)
    ys = np.linspace(-cfg.extent + cfg.dx / 2, cfg.extent - cfg.dx / 2, cfg.ny)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], 1)

    poly = place_airfoil(
        naca4_polyline(cfg.camber, cfg.camber_pos, cfg.thickness), cfg.aoa_deg
    )
    inside, dist = airfoil_mask_and_distance(poly, pts)
    # smooth indicator over ~smooth_cells cells (stabilizes penalization)
    w = smooth_cells * cfg.dx
    chi = np.where(
        inside, 1.0, np.clip(1.0 - dist / w, 0.0, 1.0) ** 2
    ).reshape(cfg.nx, cfg.ny)

    edge = np.minimum.reduce(
        [X + cfg.extent, cfg.extent - X, Y + cfg.extent, cfg.extent - Y]
    )
    sponge = cfg.sponge_rate * np.clip(
        1.0 - edge / cfg.sponge_width, 0.0, 1.0
    ) ** 2

    U_inf = freestream_state(cfg)
    U0 = np.broadcast_to(U_inf[:, None, None], (4, cfg.nx, cfg.ny)).copy()
    # start from free-stream with the body switched on: the settle phase
    # washes the impulsive transient out through the sponge
    step = make_step(
        cfg, jnp.asarray(chi, jnp.float32), jnp.asarray(sponge, jnp.float32),
        jnp.asarray(U_inf, jnp.float32)
    )

    sub = max(1, int(round(cfg.frame_dt / cfg.dt)))
    n_settle = int(round(cfg.settle_time / cfg.dt))

    @jax.jit
    def advance(U, n):
        return jax.lax.fori_loop(0, n, lambda i, u: step(u), U)

    U = jnp.asarray(U0)
    # the axon TPU worker faults on single jitted loops of >~2k 2D stencil
    # steps (PERFORMANCE.md quirks) — chunk the settle phase host-side;
    # ``n`` is a traced argument so every chunk reuses one compilation
    chunk = 1024
    for s in range(0, n_settle, chunk):
        U = advance(U, min(chunk, n_settle - s))

    frames = np.zeros((cfg.n_frames, 4, cfg.nx, cfg.ny), np.float32)

    @jax.jit
    def to_prim(U):
        rho, u, v, p = _primitive(U)
        return jnp.stack([rho, u, v, p])

    for f in range(cfg.n_frames):
        frames[f] = np.asarray(to_prim(U))
        if f < cfg.n_frames - 1:
            U = advance(U, sub)
    grid = np.stack([X, Y], -1).astype(np.float32)
    return frames, chi.astype(np.float32), grid


# --------------------------------------------------------------------------
# FEM-like node sampling + npz export (reference protocol)
# --------------------------------------------------------------------------


def sample_nodes(
    cfg: AirfoilConfig,
    rng: np.random.Generator,
    n_interior: int = 1200,
    n_surface: int = 160,
    n_farfield: int = 80,
):
    """Scattered nodes: surface ring (raw type 2), far-field box (raw 4),
    interior fluid nodes refined toward the body and wake (raw 0)."""
    poly = place_airfoil(
        naca4_polyline(cfg.camber, cfg.camber_pos, cfg.thickness), cfg.aoa_deg
    )
    # surface nodes: resample the polyline uniformly by arc length, pushed
    # slightly outward so bilinear gathers read fluid-side states
    seg = np.roll(poly, -1, axis=0) - poly
    arclen = np.concatenate([[0.0], np.cumsum(np.sqrt((seg**2).sum(1)))])
    t = np.linspace(0, arclen[-1], n_surface, endpoint=False)
    idx = np.searchsorted(arclen, t, side="right") - 1
    frac = (t - arclen[idx]) / np.maximum(
        np.sqrt((seg[idx] ** 2).sum(1)), 1e-12
    )
    spts = poly[idx] + frac[:, None] * seg[idx]
    # polyline runs upper nose->tail then lower tail->nose (clockwise), so
    # the outward normal of segment (dx, dy) is (-dy, dx)
    normals = np.stack([-seg[idx][:, 1], seg[idx][:, 0]], 1)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    spts = spts + 3.0 * cfg.dx * normals  # offset outside the smoothed mask

    # far-field nodes on the inner edge of the sponge
    lim = cfg.extent - cfg.sponge_width
    per = n_farfield // 4
    lin = np.linspace(-lim, lim, per)
    fpts = np.concatenate(
        [
            np.stack([lin, np.full(per, -lim)], 1),
            np.stack([lin, np.full(per, lim)], 1),
            np.stack([np.full(per, -lim), lin], 1),
            np.stack([np.full(per, lim), lin], 1),
        ]
    )

    # interior nodes: rejection-sample with density ~ 1/(d + d0), plus a
    # wake strip behind the airfoil
    cand = rng.uniform(-lim, lim, size=(n_interior * 12, 2))
    inside, dist = airfoil_mask_and_distance(poly, cand)
    keep_p = 0.12 / (dist + 0.12)
    wake = (cand[:, 0] > 0.0) & (np.abs(cand[:, 1]) < 0.6)
    keep_p = np.where(wake, np.maximum(keep_p, 0.25), keep_p)
    ok = (~inside) & (dist > 3.5 * cfg.dx) & (rng.uniform(size=len(cand)) < keep_p)
    ipts = cand[ok][:n_interior]

    pos = np.concatenate([ipts, spts, fpts]).astype(np.float32)
    node_type = np.concatenate(
        [
            np.zeros(len(ipts), np.int32),
            np.full(len(spts), 2, np.int32),
            np.full(len(fpts), 4, np.int32),
        ]
    )
    return pos, node_type


def interpolate_frames(
    frames: np.ndarray, pos: np.ndarray, cfg: AirfoilConfig
) -> np.ndarray:
    """Bilinear gather of (T, 4, H, W) frames at scattered pos (N, 2) —
    batched over frames on device. Returns (T, N, 4)."""
    gx = (pos[:, 0] + cfg.extent - cfg.dx / 2) / cfg.dx
    gy = (pos[:, 1] + cfg.extent - cfg.dx / 2) / cfg.dx
    x0 = np.clip(np.floor(gx).astype(np.int32), 0, cfg.nx - 2)
    y0 = np.clip(np.floor(gy).astype(np.int32), 0, cfg.ny - 2)
    fx = np.clip(gx - x0, 0.0, 1.0).astype(np.float32)
    fy = np.clip(gy - y0, 0.0, 1.0).astype(np.float32)

    @jax.jit
    def gather(fr):
        f00 = fr[:, :, x0, y0]
        f10 = fr[:, :, x0 + 1, y0]
        f01 = fr[:, :, x0, y0 + 1]
        f11 = fr[:, :, x0 + 1, y0 + 1]
        return jnp.moveaxis(
            f00 * (1 - fx) * (1 - fy)
            + f10 * fx * (1 - fy)
            + f01 * (1 - fx) * fy
            + f11 * fx * fy,
            1,
            2,
        )  # (T, N, 4)

    return np.asarray(gather(jnp.asarray(frames)))


def generate_sample(seed: int, base: AirfoilConfig | None = None):
    """One airfoil trajectory with randomized Mach/AoA/shape; returns the
    npz dict in the reference's schema."""
    rng = np.random.default_rng(seed)
    base = base or AirfoilConfig()
    cfg = dataclasses.replace(
        base,
        mach=float(rng.uniform(0.30, 0.62)),
        aoa_deg=float(rng.uniform(-10.0, 10.0)),
        camber=float(rng.uniform(0.0, 0.045)),
        camber_pos=float(rng.uniform(0.3, 0.5)),
        thickness=float(rng.uniform(0.09, 0.16)),
    )
    frames, _, _ = simulate(cfg)
    pos, node_type = sample_nodes(cfg, rng)
    states = interpolate_frames(frames, pos, cfg)  # (T, N, 4): rho,u,v,p

    from scipy.spatial import Delaunay

    cells = Delaunay(pos).simplices.astype(np.int32)
    T = cfg.n_frames
    return {
        "pos": np.repeat(pos[None], T, 0),
        "node_type": np.repeat(node_type[None, :, None], T, 0),
        "cells": np.repeat(cells[None], T, 0),
        "dns": states[..., 0:1],
        "vel": states[..., 1:3],
        "prs": states[..., 3:4],
        "meta": np.array(
            [cfg.mach, cfg.aoa_deg, cfg.camber, cfg.camber_pos, cfg.thickness],
            np.float32,
        ),
    }


def generate_dataset(
    out_dir: str,
    seeds: list[int],
    base: AirfoilConfig | None = None,
    verbose: bool = True,
):
    """Write one npz per seed + the loader's statistics npz."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    vel_all, prs_all, dns_all = [], [], []
    import time as _time

    for s in seeds:
        t0 = _time.time()
        d = generate_sample(s, base)
        np.savez_compressed(out / f"airfoil_{s:04d}.npz", **d)
        vel_all.append(d["vel"])
        prs_all.append(d["prs"])
        dns_all.append(d["dns"])
        if verbose:
            print(
                f"seed {s}: {d['vel'].shape[1]} nodes, "
                f"{_time.time() - t0:.1f}s", flush=True,
            )
    vel = np.concatenate([v.reshape(-1, 2) for v in vel_all])
    prs = np.concatenate([p.ravel() for p in prs_all])
    dns = np.concatenate([x.ravel() for x in dns_all])
    pos_lim = (base or AirfoilConfig()).extent
    np.savez(
        out / "af_train_data_statistics.npz",
        dns_mean=dns.mean(), dns_std=dns.std(),
        prs_mean=prs.mean(), prs_std=prs.std(),
        vel_x_mean=vel[:, 0].mean(), vel_x_std=vel[:, 0].std(),
        vel_y_mean=vel[:, 1].mean(), vel_y_std=vel[:, 1].std(),
        pos_x_min=-pos_lim, pos_x_max=pos_lim,
        pos_y_min=-pos_lim, pos_y_max=pos_lim,
        x_len=2.0 * pos_lim, y_len=2.0 * pos_lim,
    )


def load_airfoil_dataset(data_dir: str, n_points: int | None = None):
    """Read generated npz files into the point-set training dict
    (fields (S,T,N,4) standardized per statistics, coords normalized to
    [0,1], mapped node types {0,1,2}) — the reference loader's
    use_normalized=True path (dataset_new.py:622-660)."""
    files = sorted(Path(data_dir).glob("airfoil_*.npz"))
    stats = np.load(Path(data_dir) / "af_train_data_statistics.npz")
    fields, coords, ntypes = [], [], []
    nmap = {0: 0, 2: 1, 4: 2}
    for f in files:
        d = np.load(f)
        vel, prs, dns = d["vel"], d["prs"], d["dns"]
        x = np.concatenate(
            [
                (vel[..., 0:1] - stats["vel_x_mean"]) / stats["vel_x_std"],
                (vel[..., 1:2] - stats["vel_y_mean"]) / stats["vel_y_std"],
                (prs - stats["prs_mean"]) / stats["prs_std"],
                (dns - stats["dns_mean"]) / stats["dns_std"],
            ],
            axis=-1,
        ).astype(np.float32)
        pos = d["pos"][0]
        pos01 = (pos - [stats["pos_x_min"], stats["pos_y_min"]]) / [
            stats["x_len"], stats["y_len"],
        ]
        nt = np.vectorize(nmap.get)(d["node_type"][0, :, 0]).astype(np.int32)
        if n_points is not None:
            sel = np.arange(min(n_points, x.shape[1]))
            x, pos01, nt = x[:, sel], pos01[sel], nt[sel]
        fields.append(x)
        coords.append(pos01.astype(np.float32))
        ntypes.append(nt)
    n_min = min(f.shape[1] for f in fields)
    fields = np.stack([f[:, :n_min] for f in fields])
    coords = np.stack([c[:n_min] for c in coords])
    ntypes = np.stack([t[:n_min] for t in ntypes])
    return dict(fields=fields, coords=coords, node_type=ntypes)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="data/airfoil")
    p.add_argument("--seed-start", type=int, default=0)
    p.add_argument("--nsample", type=int, default=16)
    p.add_argument("--nx", type=int, default=384)
    p.add_argument("--frames", type=int, default=101)
    a = p.parse_args(argv)
    base = AirfoilConfig(nx=a.nx, ny=a.nx, n_frames=a.frames)
    generate_dataset(a.out, list(range(a.seed_start, a.seed_start + a.nsample)), base)


if __name__ == "__main__":
    main()
