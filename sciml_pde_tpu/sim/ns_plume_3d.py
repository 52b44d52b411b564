"""3D buoyant smoke plume simulator, JAX-native.

Capability parity with the reference's phiflow-JAX generator
(``pdebench/data_gen/src/3d_ns_phiflow/generate_3D_plume.py:13-90``):
sphere inflow at the bottom of a closed unit box, MacCormack smoke
advection, semi-Lagrangian velocity advection, explicit diffusion,
randomly-jittered buoyancy ((fx, fy) ~ U(-1e-4, 1e-4), fz = 5e-4, scaled by
the local smoke density), warm-started CG pressure projection (rel tol
1e-3), 150 stored frames x 10 substeps at dt = 2e-4; outputs trilinearly
resampled to (50, 50, 89) with align_corners=True, the initial frame
dropped, and time linearly resampled back to 150 frames (reference :50-62).

Note: the reference draws its buoyancy jitter with python ``random`` inside
``@jit_compile`` (reference :39-41), so the value is traced ONCE and is in
fact constant over a trajectory; we reproduce that actual behaviour by
drawing the jitter once per trajectory with ``jax.random``.

TPU-first: one jitted ``lax.scan`` over frames (inner scan over substeps),
MAC staggered grid, matrix-free CG under ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Plume3DConfig:
    res: tuple[int, int, int] = (50, 50, 89)
    dt: float = 2e-4
    viscosity: float = 1e-3
    n_frames: int = 150
    substeps: int = 10
    inflow_radius_frac: float = 0.1
    inflow_strength: float = 0.1
    buoyancy_z: float = 5e-4
    buoyancy_jitter: float = 1e-4
    cg_tol: float = 1e-3
    cg_max_iter: int = 400
    pressure_solver: str = "dct"  # dct (direct, exact) | cg
    out_res: tuple[int, int, int] = (50, 50, 89)
    out_frames: int = 150
    # decomposition / variant knobs (reference run_3D_NS.py target dirs
    # encode decomp/downsample/OOD dataset variants)
    enable_advection: bool = True
    enable_diffusion: bool = True
    enable_buoyancy: bool = True
    enable_projection: bool = True


# --------------------------------------------------------------------------
# trilinear sampling on a 3D lattice
# --------------------------------------------------------------------------


def trilinear(field, x, y, z, zero_outside: bool):
    nx, ny, nz = field.shape
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    tx, ty, tz = x - x0, y - y0, z - z0
    xi, yi, zi = x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)

    def get(ix, iy, iz):
        v = field[
            jnp.clip(ix, 0, nx - 1), jnp.clip(iy, 0, ny - 1), jnp.clip(iz, 0, nz - 1)
        ]
        if zero_outside:
            inside = (
                (ix >= 0) & (ix <= nx - 1)
                & (iy >= 0) & (iy <= ny - 1)
                & (iz >= 0) & (iz <= nz - 1)
            )
            v = jnp.where(inside, v, 0.0)
        return v

    out = 0.0
    for dx_, wx in [(0, 1 - tx), (1, tx)]:
        for dy_, wy in [(0, 1 - ty), (1, ty)]:
            for dz_, wz in [(0, 1 - tz), (1, tz)]:
                out = out + wx * wy * wz * get(xi + dx_, yi + dy_, zi + dz_)
    return out


def _centers(n):
    return jnp.arange(n, dtype=jnp.float32) + 0.5


def _faces(n):
    return jnp.arange(n + 1, dtype=jnp.float32)


def _positions_u(nx, ny, nz):
    return jnp.meshgrid(_faces(nx), _centers(ny), _centers(nz), indexing="ij")


def _positions_v(nx, ny, nz):
    return jnp.meshgrid(_centers(nx), _faces(ny), _centers(nz), indexing="ij")


def _positions_w(nx, ny, nz):
    return jnp.meshgrid(_centers(nx), _centers(ny), _faces(nz), indexing="ij")


def _positions_c(nx, ny, nz):
    return jnp.meshgrid(_centers(nx), _centers(ny), _centers(nz), indexing="ij")


def velocity_at3(u, v, w, x, y, z):
    """MAC velocity sampled at points given in cell units.

    u lattice point (i,j,k) sits at (i, j+.5, k+.5); v at (i+.5, j, k+.5);
    w at (i+.5, j+.5, k)."""
    us = trilinear(u, x, y - 0.5, z - 0.5, True)
    vs = trilinear(v, x - 0.5, y, z - 0.5, True)
    ws = trilinear(w, x - 0.5, y - 0.5, z, True)
    return us, vs, ws


def _wall_bc3(u, v, w):
    u = u.at[0].set(0.0).at[-1].set(0.0)
    v = v.at[:, 0].set(0.0).at[:, -1].set(0.0)
    w = w.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
    return u, v, w


def advect_velocity3(u, v, w, dtc):
    nx, ny, nz = v.shape[0], u.shape[1], u.shape[2]

    def comp(field, pos, off):
        x, y, z = pos
        uu, vv, ww = velocity_at3(u, v, w, x, y, z)
        bx, by, bz = x - dtc[0] * uu, y - dtc[1] * vv, z - dtc[2] * ww
        return trilinear(field, bx - off[0], by - off[1], bz - off[2], True)

    un = comp(u, _positions_u(nx, ny, nz), (0.0, 0.5, 0.5))
    vn = comp(v, _positions_v(nx, ny, nz), (0.5, 0.0, 0.5))
    wn = comp(w, _positions_w(nx, ny, nz), (0.5, 0.5, 0.0))
    return _wall_bc3(un, vn, wn)


def _sl_smoke(c, u, v, w, dtc, sign=1.0):
    nx, ny, nz = c.shape
    x, y, z = _positions_c(nx, ny, nz)
    uu, vv, ww = velocity_at3(u, v, w, x, y, z)
    bx = x - sign * dtc[0] * uu
    by = y - sign * dtc[1] * vv
    bz = z - sign * dtc[2] * ww
    return trilinear(c, bx - 0.5, by - 0.5, bz - 0.5, False)


def maccormack_smoke(c, u, v, w, dtc):
    """MacCormack advection with local min/max limiting (phiflow
    advect.mac_cormack behaviour)."""
    fwd = _sl_smoke(c, u, v, w, dtc, 1.0)
    back = _sl_smoke(fwd, u, v, w, dtc, -1.0)
    corrected = fwd + 0.5 * (c - back)
    # limit to the neighbourhood extrema of the forward estimate
    p = jnp.pad(c, 1, mode="edge")
    stack = jnp.stack(
        [
            p[1:-1, 1:-1, 1:-1], p[:-2, 1:-1, 1:-1], p[2:, 1:-1, 1:-1],
            p[1:-1, :-2, 1:-1], p[1:-1, 2:, 1:-1],
            p[1:-1, 1:-1, :-2], p[1:-1, 1:-1, 2:],
        ]
    )
    lo, hi = stack.min(0), stack.max(0)
    return jnp.clip(corrected, lo, hi)


def diffuse3(f, coef, zero_axes):
    """Explicit diffusion; Dirichlet-0 across the ``zero_axes`` walls
    (normal direction of a face field), Neumann elsewhere."""
    lap = jnp.zeros_like(f)
    for ax in range(3):
        if ax in zero_axes:
            p = jnp.pad(f, [(1, 1) if a == ax else (0, 0) for a in range(3)])
        else:
            p = jnp.pad(
                f, [(1, 1) if a == ax else (0, 0) for a in range(3)], mode="edge"
            )
        sl = [slice(None)] * 3
        sl_hi = list(sl); sl_hi[ax] = slice(2, None)
        sl_lo = list(sl); sl_lo[ax] = slice(0, -2)
        lap = lap + (p[tuple(sl_hi)] - 2 * f + p[tuple(sl_lo)]) * coef[ax]
    return f + lap


def divergence3(u, v, w, d):
    return (
        (u[1:] - u[:-1]) / d[0]
        + (v[:, 1:] - v[:, :-1]) / d[1]
        + (w[:, :, 1:] - w[:, :, :-1]) / d[2]
    )


def _lap_neumann3(p, d):
    out = jnp.zeros_like(p)
    for ax in range(3):
        pad = jnp.pad(p, [(1, 1) if a == ax else (0, 0) for a in range(3)], mode="edge")
        sl_hi = [slice(None)] * 3; sl_hi[ax] = slice(2, None)
        sl_lo = [slice(None)] * 3; sl_lo[ax] = slice(0, -2)
        out = out + (pad[tuple(sl_hi)] - 2 * p + pad[tuple(sl_lo)]) / d[ax] ** 2
    return out


def solve_pressure_dct3(div, d):
    """Direct Neumann Poisson solve via three-axis DCT-II diagonalization
    (see ns_incomp_2d.solve_pressure_dct)."""
    from sciml_pde_tpu.sim.ns_incomp_2d import _dct2_factors

    nx, ny, nz = div.shape
    cs = [jnp.asarray(_dct2_factors(n)) for n in (nx, ny, nz)]
    lams = [
        (2.0 * np.cos(np.pi * np.arange(n) / n) - 2.0) / dd**2
        for n, dd in zip((nx, ny, nz), d)
    ]
    lam = jnp.asarray(
        lams[0][:, None, None] + lams[1][None, :, None] + lams[2][None, None, :]
    )
    prec = jax.lax.Precision.HIGHEST
    h = jnp.einsum("ax,xyz->ayz", cs[0], div, precision=prec)
    h = jnp.einsum("by,ayz->abz", cs[1], h, precision=prec)
    h = jnp.einsum("cz,abz->abc", cs[2], h, precision=prec)
    h = jnp.where(lam != 0.0, h / jnp.where(lam != 0.0, lam, 1.0), 0.0)
    h = jnp.einsum("ax,abc->xbc", cs[0], h, precision=prec)
    h = jnp.einsum("by,xbc->xyc", cs[1], h, precision=prec)
    h = jnp.einsum("cz,xyc->xyz", cs[2], h, precision=prec)
    return h


def solve_pressure_cg3(div, d, tol, max_iter, x0=None):
    b = -(div - jnp.mean(div))
    bnorm = jnp.linalg.norm(b) + 1e-30

    def A(p):
        return -_lap_neumann3(p, d)

    p0 = jnp.zeros_like(b) if x0 is None else x0 - jnp.mean(x0)
    r0 = b - A(p0)
    d0 = r0
    rs0 = jnp.vdot(r0, r0).real

    def cond(s):
        _, _, _, rs, _, rs_best, it = s
        return (jnp.sqrt(rs_best) > tol * bnorm) & (rs <= 1e4 * rs_best) & (it < max_iter)

    def body(s):
        p, r, dd, rs, p_best, rs_best, it = s
        Ad = A(dd)
        alpha = rs / (jnp.vdot(dd, Ad).real + 1e-30)
        p = p + alpha * dd
        r = r - alpha * Ad
        rs_new = jnp.vdot(r, r).real
        dd = r + (rs_new / (rs + 1e-30)) * dd
        better = rs_new < rs_best
        p_best = jnp.where(better, p, p_best)
        rs_best = jnp.where(better, rs_new, rs_best)
        return p, r, dd, rs_new, p_best, rs_best, it + 1

    *_, p_best, _, _ = jax.lax.while_loop(cond, body, (p0, r0, d0, rs0, p0, rs0, jnp.int32(0)))
    return p_best - jnp.mean(p_best)


def project3(u, v, w, d, tol, max_iter, p_prev, method: str = "dct"):
    div = divergence3(u, v, w, d)
    if method == "dct":
        p = solve_pressure_dct3(div, d)
    else:
        p = solve_pressure_cg3(div, d, tol, max_iter, x0=p_prev)
    u = u.at[1:-1].add(-(p[1:] - p[:-1]) / d[0])
    v = v.at[:, 1:-1].add(-(p[:, 1:] - p[:, :-1]) / d[1])
    w = w.at[:, :, 1:-1].add(-(p[:, :, 1:] - p[:, :, :-1]) / d[2])
    return (*_wall_bc3(u, v, w), p)


def _center_to_face(c, ax):
    mid_sl_a = [slice(None)] * 3; mid_sl_a[ax] = slice(1, None)
    mid_sl_b = [slice(None)] * 3; mid_sl_b[ax] = slice(0, -1)
    mid = 0.5 * (c[tuple(mid_sl_a)] + c[tuple(mid_sl_b)])
    first = [slice(None)] * 3; first[ax] = slice(0, 1)
    last = [slice(None)] * 3; last[ax] = slice(-1, None)
    return jnp.concatenate([c[tuple(first)], mid, c[tuple(last)]], axis=ax)


def inflow_field(cfg: Plume3DConfig) -> np.ndarray:
    """Soft sphere indicator at the bottom-center of the unit box, scaled by
    ``inflow_strength`` (reference :26-29)."""
    nx, ny, nz = cfg.res
    dx = 1.0 / nx
    x = (np.arange(nx) + 0.5) / nx
    y = (np.arange(ny) + 0.5) / ny
    z = (np.arange(nz) + 0.5) / nz
    X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
    r = cfg.inflow_radius_frac
    dist = np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2 + Z**2)
    # soft coverage: ~1 inside, smooth ramp over one cell at the surface
    soft = np.clip((r - dist) / dx + 0.5, 0.0, 1.0)
    return (cfg.inflow_strength * soft).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "n_frames"))
def _simulate_chunk(state, f_vec, inflow, cfg: Plume3DConfig, n_frames: int):
    """Advance ``n_frames`` stored frames from ``state``; returns the new
    state and the per-frame centered velocity/smoke."""
    u, v, w, smoke, pressure = state
    nx, ny, nz = cfg.res
    d = (1.0 / nx, 1.0 / ny, 1.0 / nz)
    dtc = (cfg.dt / d[0], cfg.dt / d[1], cfg.dt / d[2])
    visc_coef = tuple(cfg.viscosity * cfg.dt / dd**2 for dd in d)

    def substep(carry, _):
        u, v, w, smoke, pressure = carry
        smoke = maccormack_smoke(smoke, u, v, w, dtc) + inflow
        if cfg.enable_advection:
            u, v, w = advect_velocity3(u, v, w, dtc)
        if cfg.enable_diffusion:
            u = diffuse3(u, visc_coef, zero_axes=(0,))
            v = diffuse3(v, visc_coef, zero_axes=(1,))
            w = diffuse3(w, visc_coef, zero_axes=(2,))
        if cfg.enable_buoyancy:
            u = u + _center_to_face(smoke, 0) * f_vec[0]
            v = v + _center_to_face(smoke, 1) * f_vec[1]
            w = w + _center_to_face(smoke, 2) * f_vec[2]
        u, v, w = _wall_bc3(u, v, w)
        if cfg.enable_projection:
            u, v, w, pressure = project3(u, v, w, d, cfg.cg_tol, cfg.cg_max_iter,
                                         pressure, method=cfg.pressure_solver)
        return (u, v, w, smoke, pressure), None

    def frame(carry, _):
        carry, _ = jax.lax.scan(substep, carry, None, length=cfg.substeps)
        u, v, w, smoke, _ = carry
        uc = 0.5 * (u[1:] + u[:-1])
        vc = 0.5 * (v[:, 1:] + v[:, :-1])
        wc = 0.5 * (w[:, :, 1:] + w[:, :, :-1])
        return carry, (jnp.stack([uc, vc, wc], axis=-1), smoke)

    carry, (vel, smk) = jax.lax.scan(frame, (u, v, w, smoke, pressure), None,
                                     length=n_frames)
    return carry, vel, smk


def simulate_plume(seed_key, cfg: Plume3DConfig, chunk_frames: int = 10):
    """Returns velocity (n_frames, nx, ny, nz, 3) centered, smoke
    (n_frames, nx, ny, nz), both EXCLUDING the initial rest frame.

    The frame loop is chunked across jit calls (chunk_frames per program):
    very long scans of this 3D kernel can fault some TPU runtimes, and
    chunking costs nothing (the compiled chunk is reused)."""
    nx, ny, nz = cfg.res
    inflow = jnp.asarray(inflow_field(cfg))
    jit_x, jit_y = jax.random.uniform(
        seed_key, (2,), minval=-cfg.buoyancy_jitter, maxval=cfg.buoyancy_jitter
    )
    f_vec = (jit_x, jit_y, cfg.buoyancy_z)

    state = (
        jnp.zeros((nx + 1, ny, nz)),
        jnp.zeros((nx, ny + 1, nz)),
        jnp.zeros((nx, ny, nz + 1)),
        jnp.zeros((nx, ny, nz)),
        jnp.zeros((nx, ny, nz)),
    )
    vels, smks = [], []
    remaining = cfg.n_frames
    while remaining > 0:
        n = min(chunk_frames, remaining)
        state, vel, smk = _simulate_chunk(state, f_vec, inflow, cfg, n)
        vels.append(vel)
        smks.append(smk)
        remaining -= n
    return jnp.concatenate(vels, axis=0), jnp.concatenate(smks, axis=0)


def _resize_align_corners_1d(arr: jnp.ndarray, axis: int, new_len: int) -> jnp.ndarray:
    """Linear resize with align_corners=True along one axis (torch
    F.interpolate parity, reference :53-62)."""
    n = arr.shape[axis]
    if n == new_len:
        return arr
    pos = jnp.linspace(0.0, n - 1.0, new_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, n - 1)
    t = (pos - lo).reshape([-1 if a == axis else 1 for a in range(arr.ndim)])
    a = jnp.take(arr, lo, axis=axis)
    b = jnp.take(arr, hi, axis=axis)
    return a * (1 - t) + b * t


@functools.partial(jax.jit, static_argnames=("cfg",))
def _resample_outputs_jit(vel, smk, cfg: Plume3DConfig):
    # must be jitted: eager gather chains on large arrays can fault this
    # TPU runtime's worker (same class of issue as eager complex ops)
    for ax, target in zip((1, 2, 3), cfg.out_res):
        vel = _resize_align_corners_1d(vel, ax, target)
        smk = _resize_align_corners_1d(smk, ax, target)
    vel = vel[1:]
    smk = smk[1:]
    vel = _resize_align_corners_1d(vel, 0, cfg.out_frames)
    smk = _resize_align_corners_1d(smk, 0, cfg.out_frames)
    v_data = jnp.transpose(vel, (1, 2, 3, 0, 4))  # (X, Y, Z, T, 3)
    return v_data, smk


def resample_outputs(vel, smk, cfg: Plume3DConfig):
    """Spatial trilinear resample to out_res, drop initial frame, time
    resample to out_frames — the reference's post-processing (:53-62).

    Returns v_data (X, Y, Z, T, 3) and s_data (T, X, Y, Z), the on-disk
    layouts of v_trj_seed{i}.h5 / s_trj_seed{i}.h5.
    """
    v_data, s_data = _resample_outputs_jit(vel, smk, cfg)
    return np.asarray(v_data), np.asarray(s_data)


def generate_plume_files(path, seed: int, cfg: Plume3DConfig, suffix: str = ""):
    """Write v_trj_seed{seed}{suffix}.h5 / s_trj_seed{seed}{suffix}.h5."""
    import h5py
    from pathlib import Path

    vel, smk = simulate_plume(jax.random.PRNGKey(seed), cfg)
    v_data, s_data = resample_outputs(vel, smk, cfg)
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    # lzf: the device sim takes ~27 s/trajectory but gzip spent ~2 min
    # compressing it; lzf is ~20x faster at slightly larger files and the
    # schema (dataset name/shape/dtype) is unchanged
    with h5py.File(path / f"v_trj_seed{seed}{suffix}.h5", "w") as f:
        f.create_dataset("data", data=v_data, compression="lzf", shuffle=True)
    with h5py.File(path / f"s_trj_seed{seed}{suffix}.h5", "w") as f:
        f.create_dataset("data", data=s_data, compression="lzf", shuffle=True)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", required=True)
    p.add_argument("--seed-start", type=int, default=0)
    p.add_argument("--n-seeds", type=int, default=1)
    p.add_argument("--res", type=int, nargs=3, default=[50, 50, 89])
    p.add_argument("--dt", type=float, default=2e-4)
    p.add_argument("--viscosity", type=float, default=1e-3)
    p.add_argument("--frames", type=int, default=150)
    p.add_argument("--suffix", default="", help="e.g. _interp for primary files")
    p.add_argument(
        "--variant", default="full",
        choices=["full", "convection", "diffusion", "downsample", "ood"],
        help="decomposed basic forms / downsampled / out-of-distribution "
             "datasets (reference run_3D_NS.py target-dir variants)",
    )
    a = p.parse_args(argv)
    variant_over = {
        "full": {},
        "convection": {"enable_diffusion": False, "enable_buoyancy": False},
        "diffusion": {"enable_advection": False, "enable_buoyancy": False,
                      "enable_projection": False},
        "downsample": {"out_res": tuple(s // 2 for s in a.res)},
        "ood": {"viscosity": a.viscosity * 10.0, "inflow_radius_frac": 0.15},
    }[a.variant]
    kwargs = dict(
        res=tuple(a.res), dt=a.dt, viscosity=a.viscosity, n_frames=a.frames,
        out_res=tuple(a.res), out_frames=a.frames,
    )
    kwargs.update(variant_over)
    cfg = Plume3DConfig(**kwargs)
    for s in range(a.seed_start, a.seed_start + a.n_seeds):
        generate_plume_files(a.path, s, cfg, a.suffix)
        print(f"seed {s} done", flush=True)


if __name__ == "__main__":
    main()
