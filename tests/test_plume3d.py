"""3D plume simulator + 3D loaders + 3D transformer, tiny end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.sim.ns_plume_3d import (
    Plume3DConfig,
    generate_plume_files,
    inflow_field,
    simulate_plume,
    _resize_align_corners_1d,
)
from sciml_pde_tpu.data.ns3d import load_ns3d_aux
from sciml_pde_tpu.models.transformer3d import VideoMAEOperator3D, Transformer3DAux
from sciml_pde_tpu.models import FNO3dAux

pytestmark = pytest.mark.slow

TINY = Plume3DConfig(
    res=(8, 8, 12), dt=1e-3, n_frames=6, substeps=2, cg_tol=1e-3,
    cg_max_iter=100, out_res=(8, 8, 12), out_frames=6,
)


def test_resize_align_corners_matches_torch_semantics():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    a = rng.normal(size=(5, 7)).astype(np.float32)
    got = np.asarray(_resize_align_corners_1d(jnp.asarray(a), 1, 11))
    want = (
        F.interpolate(torch.tensor(a)[None], size=11, mode="linear", align_corners=True)
        .squeeze(0).numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_inflow_is_bottom_center_sphere():
    f = inflow_field(TINY)
    assert f.max() > 0
    # peak at bottom-center, zero near the top
    assert f[:, :, -1].max() == 0.0
    cx = np.unravel_index(np.argmax(f[:, :, 0]), f[:, :, 0].shape)
    assert abs(cx[0] - 4) <= 1 and abs(cx[1] - 4) <= 1


def test_plume_rises_and_stays_finite():
    vel, smk = simulate_plume(jax.random.PRNGKey(0), TINY)
    assert vel.shape == (6, 8, 8, 12, 3)
    assert smk.shape == (6, 8, 8, 12)
    assert np.isfinite(np.asarray(vel)).all() and np.isfinite(np.asarray(smk)).all()
    # smoke accumulates (inflow) and the plume's center of mass rises
    m0, m1 = np.asarray(smk[0]), np.asarray(smk[-1])
    assert m1.sum() > m0.sum()
    zc = np.arange(12)
    com0 = (m0.sum((0, 1)) * zc).sum() / m0.sum()
    com1 = (m1.sum((0, 1)) * zc).sum() / m1.sum()
    assert com1 > com0


@pytest.fixture(scope="module")
def plume_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("plume")
    for i in [0, 275]:
        generate_plume_files(folder, i, TINY, suffix="_interp")
    for i in range(3):
        generate_plume_files(folder, i, TINY, suffix="")
    generate_plume_files(folder, 275, TINY, suffix="")
    return folder


def test_load_ns3d_aux(plume_folder):
    ds = load_ns3d_aux(
        str(plume_folder), train_subsample=(1, 1, 3), num_aux_samples=3,
        initial_step=3, test_seeds=[275],
    )
    assert ds.primary_train.data.shape == (1, 6, 8, 8, 12, 4)
    assert ds.aux_train.data.shape == (3, 6, 8, 8, 12, 4)
    assert ds.primary_train.grid.shape == (8, 8, 12, 3)


def test_load_ns3d_aux_bf16_stores(plume_folder):
    """bf16 device stores (primary + aux): the HBM-fit path for the 3D aux
    run; test store and metrics stay fp32 (mirrors data/ns.py semantics)."""
    ds = load_ns3d_aux(
        str(plume_folder), train_subsample=(1, 1, 3), num_aux_samples=3,
        initial_step=3, test_seeds=[275],
        aux_store_dtype="bf16", store_dtype="bf16",
    )
    assert str(ds.primary_train.data.dtype) == "bfloat16"
    assert str(ds.aux_train.data.dtype) == "bfloat16"
    assert ds.primary_test.data.dtype == jnp.float32


def test_transformer3d_aux_signature(plume_folder):
    ds = load_ns3d_aux(
        str(plume_folder), train_subsample=(1, 1, 3), num_aux_samples=3,
        initial_step=4, test_seeds=[275],
    )
    from sciml_pde_tpu.data.windows import gather_windows

    idx = jnp.asarray(np.array([[0, 0]], np.int32))
    x, y = gather_windows(ds.primary_train.data, idx, 4, 1)
    xa = jnp.concatenate([x] * 3, 0)
    model = Transformer3DAux(
        core_kwargs=dict(
            img_size=(8, 8, 12), patch_size=(4, 4, 5), tubelet_size=2,
            in_chans=4, num_frames=4, encoder_dim=32, encoder_depth=1,
            encoder_heads=4, decoder_dim=16, decoder_depth=1, decoder_heads=2,
        )
    )
    g = jnp.broadcast_to(ds.primary_train.grid[None], (1,) + ds.primary_train.grid.shape)
    ga = jnp.concatenate([g] * 3, 0)
    params = model.init(jax.random.PRNGKey(0), x, g, xa, ga)["params"]
    out_p, out_a = model.apply({"params": params}, x, g, xa, ga)
    assert out_p.shape == (1, 8, 8, 12, 1, 4)
    assert out_a.shape == (3, 8, 8, 12, 1, 4)
    # irregular dim 12 with patch 5 forces replicate-pad + unpad
    assert np.isfinite(np.asarray(out_p)).all()


def test_fno3d_aux_on_plume_window(plume_folder):
    ds = load_ns3d_aux(
        str(plume_folder), train_subsample=(1, 1, 3), num_aux_samples=3,
        initial_step=3, test_seeds=[275],
    )
    from sciml_pde_tpu.data.windows import gather_windows

    idx = jnp.asarray(np.array([[0, 1]], np.int32))
    x, y = gather_windows(ds.primary_train.data, idx, 3, 1)
    g = jnp.broadcast_to(ds.primary_train.grid[None], (1,) + ds.primary_train.grid.shape)
    model = FNO3dAux(num_channels=4, modes1=2, modes2=2, modes3=2, width=6, initial_step=3)
    params = model.init(jax.random.PRNGKey(1), x, g, x, g)["params"]
    out_p, out_a = model.apply({"params": params}, x, g, x, g)
    assert out_p.shape == (1, 8, 8, 12, 1, 4)
