"""FNO numerical-parity tests.

- spectral_conv_2d/3d vs a plain-numpy DFT oracle;
- full FNO2d forward vs an independent torch-functional oracle (same
  weights, reference semantics: instance norm (unbiased std, eps 1e-7,
  no-grad), lift+grid concat, zero-pad 2, 4x(spectral+pointwise) with exact
  GELU, unpad, project, de-norm — per pdebench/models/fno/fno.py:95-188);
- scale equivariance induced by the norm/de-norm pair;
- two-head aux variant: shared backbone => primary and aux outputs agree
  when heads are copied.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.models import FNO2d, FNO3d, FNO2dAux
from sciml_pde_tpu.ops.spectral import (
    naive_spectral_conv_2d_numpy,
    spectral_conv_2d,
    spectral_conv_3d,
    spectral_weight_init,
)


def test_spectral_conv_2d_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    b, h, w, ci, co, m1, m2 = 2, 16, 12, 3, 5, 4, 3
    x = rng.normal(size=(b, h, w, ci)).astype(np.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    w1 = spectral_weight_init(k1, ci, co, m1, m2)
    w2 = spectral_weight_init(k2, ci, co, m1, m2)
    got = spectral_conv_2d(jnp.asarray(x), w1, w2, m1, m2)
    w1c = np.asarray(w1[0]) + 1j * np.asarray(w1[1])
    w2c = np.asarray(w2[0]) + 1j * np.asarray(w2[1])
    want = naive_spectral_conv_2d_numpy(x, w1c, w2c, m1, m2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_spectral_conv_3d_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    b, nx, ny, nz, ci, co, m = 1, 8, 8, 10, 2, 3, 2
    x = rng.normal(size=(b, nx, ny, nz, ci)).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    ws = [spectral_weight_init(k, ci, co, m, m, m) for k in keys]
    got = np.asarray(spectral_conv_3d(jnp.asarray(x), *ws, m, m, m))

    wc = [np.asarray(w[0]) + 1j * np.asarray(w[1]) for w in ws]
    xf = np.fft.rfftn(x, axes=(1, 2, 3))
    out = np.zeros((b, nx, ny, nz // 2 + 1, co), dtype=np.complex128)
    blocks = [
        (slice(0, m), slice(0, m), wc[0]),
        (slice(nx - m, nx), slice(0, m), wc[1]),
        (slice(0, m), slice(ny - m, ny), wc[2]),
        (slice(nx - m, nx), slice(ny - m, ny), wc[3]),
    ]
    for sx, sy, w in blocks:
        out[:, sx, sy, :m] = np.einsum("bxyzi,ioxyz->bxyzo", xf[:, sx, sy, :m], w)
    want = np.fft.irfftn(out, s=(nx, ny, nz), axes=(1, 2, 3))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _torch_fno2d_oracle(params, x, grid, modes, width, num_channels):
    """Independent torch implementation of the reference forward semantics."""
    import torch
    import torch.nn.functional as F

    def t(a):
        return torch.tensor(np.asarray(a), dtype=torch.float64)

    def dense(h, path):
        k = t(path["Dense_0"]["kernel"])
        b_ = t(path["Dense_0"]["bias"])
        return h @ k + b_

    x = torch.tensor(x, dtype=torch.float64)
    grid = torch.tensor(grid, dtype=torch.float64)
    std, mean = torch.std_mean(x, dim=(1, 2, 3), keepdim=True)
    std = std + 1e-7
    xn = (x - mean) / std
    b, nx, ny = xn.shape[:3]
    h = torch.cat([xn.reshape(b, nx, ny, -1), grid], dim=-1)

    bb = params["backbone"]
    h = dense(h, bb["fc0"])
    h = F.pad(h.permute(0, 3, 1, 2), [0, 2, 0, 2]).permute(0, 2, 3, 1)

    for i in range(4):
        w1 = bb[f"conv{i}"]["w1"]
        w2 = bb[f"conv{i}"]["w2"]
        w1c = torch.tensor(
            (np.asarray(w1[0]) + 1j * np.asarray(w1[1])).astype(np.complex128)
        )
        w2c = torch.tensor(
            (np.asarray(w2[0]) + 1j * np.asarray(w2[1])).astype(np.complex128)
        )
        hf = torch.fft.rfft2(h, dim=(1, 2))
        m1, m2 = modes, modes
        out = torch.zeros(
            h.shape[0], h.shape[1], h.shape[2] // 2 + 1, width, dtype=torch.complex128
        )
        out[:, :m1, :m2] = torch.einsum("bxyi,ioxy->bxyo", hf[:, :m1, :m2], w1c)
        out[:, -m1:, :m2] = torch.einsum("bxyi,ioxy->bxyo", hf[:, -m1:, :m2], w2c)
        h1 = torch.fft.irfft2(out, s=(h.shape[1], h.shape[2]), dim=(1, 2))
        h2 = dense(h, bb[f"w{i}"])
        h = h1 + h2
        if i < 3:
            h = F.gelu(h)  # exact erf gelu

    h = h[:, :nx, :ny]
    h = F.gelu(dense(h, bb["fc1"]))
    out = dense(h, params["fc2"])
    out = out * std.squeeze(-2) + mean.squeeze(-2)
    return out.unsqueeze(-2).numpy()


def test_fno2d_forward_matches_torch_oracle():
    rng = np.random.default_rng(2)
    b, nx, ny, tt, c = 2, 16, 16, 4, 2
    modes, width = 4, 8
    x = rng.normal(size=(b, nx, ny, tt, c)).astype(np.float32)
    gx, gy = np.meshgrid(np.linspace(0, 1, nx), np.linspace(0, 1, ny), indexing="ij")
    grid = np.broadcast_to(
        np.stack([gx, gy], -1)[None], (b, nx, ny, 2)
    ).astype(np.float32)

    model = FNO2d(num_channels=c, modes1=modes, modes2=modes, width=width, initial_step=tt)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(grid))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(grid)))

    want = _torch_fno2d_oracle(
        jax.tree_util.tree_map(np.asarray, params), x, grid, modes, width, c
    )
    assert got.shape == (b, nx, ny, 1, c)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fno2d_scale_equivariance():
    rng = np.random.default_rng(3)
    b, nx, ny, tt, c = 1, 16, 16, 4, 2
    x = rng.normal(size=(b, nx, ny, tt, c)).astype(np.float32)
    grid = rng.uniform(size=(b, nx, ny, 2)).astype(np.float32)
    model = FNO2d(num_channels=c, modes1=4, modes2=4, width=8, initial_step=tt)
    params = model.init(jax.random.PRNGKey(1), x, grid)["params"]
    y1 = model.apply({"params": params}, x, grid)
    y2 = model.apply({"params": params}, 3.0 * x, grid)
    np.testing.assert_allclose(np.asarray(3.0 * y1), np.asarray(y2), rtol=1e-3, atol=1e-4)


def test_fno3d_shape():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 8, 8, 10, 3, 2)).astype(np.float32)
    grid = rng.uniform(size=(1, 8, 8, 10, 3)).astype(np.float32)
    model = FNO3d(num_channels=2, modes1=2, modes2=2, modes3=2, width=6, initial_step=3)
    params = model.init(jax.random.PRNGKey(2), x, grid)["params"]
    y = model.apply({"params": params}, x, grid)
    assert y.shape == (1, 8, 8, 10, 1, 2)


def test_fno2d_aux_two_heads_share_backbone():
    rng = np.random.default_rng(5)
    b, na, nx, ny, tt, c = 2, 3, 16, 16, 4, 2
    x = rng.normal(size=(b, nx, ny, tt, c)).astype(np.float32)
    xa = rng.normal(size=(b * na, nx, ny, tt, c)).astype(np.float32)
    # one shared grid so primary rows and aux rows see identical coordinates
    g0 = rng.uniform(size=(nx, ny, 2)).astype(np.float32)
    grid = np.broadcast_to(g0[None], (b, nx, ny, 2))
    grida = np.broadcast_to(g0[None], (b * na, nx, ny, 2))

    model = FNO2dAux(num_channels=c, modes1=4, modes2=4, width=8, initial_step=tt)
    params = model.init(jax.random.PRNGKey(3), x, grid, xa, grida)["params"]
    out_p, out_a = model.apply({"params": params}, x, grid, xa, grida)
    assert out_p.shape == (b, nx, ny, 1, c)
    assert out_a.shape == (b * na, nx, ny, 1, c)

    # with identical head weights and identical inputs, both heads agree
    params2 = dict(params)
    params2["fc2_auxiliary"] = jax.tree_util.tree_map(np.copy, params["fc2_primary"])
    p3, a3 = model.apply({"params": params2}, xa[:b], grid, xa, grida)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(a3[:b]), atol=1e-5)


def test_fno_remat_same_output_and_params():
    """remat=True must produce identical params paths AND outputs (2D + 3D),
    so remat'd checkpoints interchange with non-remat ones."""
    rng = np.random.default_rng(6)
    b, nx, ny, tt, c = 1, 16, 16, 4, 2
    x = rng.normal(size=(b, nx, ny, tt, c)).astype(np.float32)
    grid = rng.uniform(size=(b, nx, ny, 2)).astype(np.float32)
    base = FNO2d(num_channels=c, modes1=4, modes2=4, width=8, initial_step=tt)
    rem = FNO2d(num_channels=c, modes1=4, modes2=4, width=8, initial_step=tt,
                remat=True)
    params = base.init(jax.random.PRNGKey(7), x, grid)["params"]
    p2 = rem.init(jax.random.PRNGKey(7), x, grid)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    y0 = base.apply({"params": params}, x, grid)
    y1 = rem.apply({"params": params}, x, grid)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    # gradients flow through the remat'd blocks identically
    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, x, grid) ** 2)

    g0 = jax.grad(lambda p: loss(base, p))(params)
    g1 = jax.grad(lambda p: loss(rem, p))(params)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                                 rtol=1e-4, atol=1e-5),
        g0, g1,
    )

    x3 = rng.normal(size=(1, 8, 8, 10, 3, 2)).astype(np.float32)
    g3 = rng.uniform(size=(1, 8, 8, 10, 3)).astype(np.float32)
    b3 = FNO3d(num_channels=2, modes1=2, modes2=2, modes3=2, width=6, initial_step=3)
    r3 = FNO3d(num_channels=2, modes1=2, modes2=2, modes3=2, width=6, initial_step=3,
               remat=True)
    p3 = b3.init(jax.random.PRNGKey(8), x3, g3)["params"]
    np.testing.assert_allclose(
        np.asarray(b3.apply({"params": p3}, x3, g3)),
        np.asarray(r3.apply({"params": p3}, x3, g3)), atol=1e-6)
