"""Fused FNO-2D step kernels (ops/fno_fused_step.py) vs the flax model.

Three equivalence layers, all on CPU (kernels run in interpreter mode):
  1. the channels-first pure-jnp reference composition reproduces
     ``models.fno.FNO2d`` exactly (same math, different layout);
  2. the Pallas kernels reproduce the reference composition;
  3. the hand-derived backward (custom_vjp) matches ``jax.grad`` of the
     flax model for every parameter leaf.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.models import FNO2d
from sciml_pde_tpu.ops.fno_fused_step import (
    FastFNOParams,
    fno2d_fused_apply,
    fno2d_fused_reference,
    pack_params,
    unpack_grads,
)

B, X, Y, T, CC = 2, 16, 16, 3, 2
WIDTH, MODES = 8, 4


@pytest.fixture(scope="module", autouse=True)
def _exact_precision():
    """Pin f32 dots: the equivalence under test is structural (kernel vs
    flax graph), so the shipped bf16 default would only add cast noise to
    the comparison against the f32 flax path."""
    from sciml_pde_tpu.ops import spectral as _spec

    prev = _spec._PRECISION
    _spec.set_dft_precision("highest")
    yield
    _spec._PRECISION = prev


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, X, Y, T, CC)).astype(np.float32))
    gx, gy = np.meshgrid(
        np.linspace(0, 1, X, dtype=np.float32),
        np.linspace(0, 1, Y, dtype=np.float32),
        indexing="ij",
    )
    grid = jnp.asarray(np.stack([gx, gy], -1))
    gridb = jnp.broadcast_to(grid[None], (B, X, Y, 2))
    model = FNO2d(num_channels=CC, modes1=MODES, modes2=MODES, width=WIDTH,
                  initial_step=T)
    params = model.init(jax.random.PRNGKey(1), x, gridb)["params"]
    win = jnp.transpose(x, (0, 3, 4, 1, 2))        # (B, T, Cc, X, Y)
    grid2 = jnp.transpose(grid, (2, 0, 1))         # (G, X, Y)
    fp = pack_params(params, MODES, MODES)
    return model, params, x, gridb, win, grid2, fp


def _flax_pred(model, params, x, gridb):
    out = model.apply({"params": params}, x, gridb)  # (B, X, Y, 1, Cc)
    return jnp.transpose(out[..., 0, :], (0, 3, 1, 2))  # (B, Cc, X, Y)


def test_reference_matches_flax(setup):
    model, params, x, gridb, win, grid2, fp = setup
    want = _flax_pred(model, params, x, gridb)
    got = fno2d_fused_reference(win, grid2, fp, MODES, MODES)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_kernels_match_reference(setup):
    model, params, x, gridb, win, grid2, fp = setup
    want = fno2d_fused_reference(win, grid2, fp, MODES, MODES)
    got = fno2d_fused_apply(win, grid2, fp, MODES, MODES)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pack_unpack_roundtrip(setup):
    model, params, *_ , fp = setup
    tree = unpack_grads(fp, MODES, MODES, params)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(tree))
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(flat_b[path]), np.asarray(leaf),
                                   rtol=0, atol=0)


def test_backward_matches_autodiff(setup):
    model, params, x, gridb, win, grid2, fp = setup
    rng = np.random.default_rng(7)
    cot = jnp.asarray(rng.normal(size=(B, CC, X, Y)).astype(np.float32))

    def loss_flax(p):
        return jnp.sum(_flax_pred(model, p, x, gridb) * cot)

    def loss_fused(fpp):
        return jnp.sum(fno2d_fused_apply(win, grid2, fpp, MODES, MODES) * cot)

    g_flax = jax.grad(loss_flax)(params)
    g_fast = jax.grad(loss_fused)(fp)
    g_tree = unpack_grads(g_fast, MODES, MODES, params)

    flat_want = jax.tree_util.tree_leaves_with_path(g_flax)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(g_tree))
    for path, want in flat_want:
        got = flat_got[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
