"""Chunked / gather-upsampled aux step: exact equivalence to the joint pass.

The reference's NS aux recipe is batch 8 x num_aux_samples 24 = 8 primary
+ 192 aux windows per optimizer step at 256^2 (config_ns.yaml:19,31), far
past one chip's HLO-temp budget in a single concatenated backbone pass.
``build_aux_step(aux_chunks=K)`` scans the aux stream in K remat'd chunks;
``aux_resize_to`` upsamples gathered aux windows inside the step (the
reference's if_downsample gather-time interpolate, utils_2d_ns.py:139-161)
so the resident aux store can live at a cheaper native resolution.  Both
must be mathematically identical to the unchunked full-res step.
"""

import h5py
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from sciml_pde_tpu.models.fno import FNO2dAux
from sciml_pde_tpu.train.fno_train import build_aux_step, run_training

B, NA, T, S, C = 4, 2, 8, 16, 3
INIT, ROLL = 3, 1


def _setup(key=0):
    rng = np.random.default_rng(key)
    prim = jnp.asarray(rng.normal(size=(4, T, S, S, C)).astype(np.float32))
    aux = jnp.asarray(rng.normal(size=(8, T, S, S, C)).astype(np.float32))
    grid = jnp.asarray(rng.normal(size=(S, S, 2)).astype(np.float32))
    idx = jnp.asarray([[0, 1], [1, 0], [2, 3], [3, 2]], jnp.int32)
    model = FNO2dAux(num_channels=C, modes1=4, modes2=4, width=8, initial_step=INIT)
    x0 = prim[:1, :INIT].transpose(0, 2, 3, 1, 4)
    g0 = grid[None]
    params = model.init(jax.random.PRNGKey(0), x0, g0, x0, g0)["params"]
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)
    return model, tx, params, opt_state, prim, aux, grid, idx


def test_param_tree_paths_unchanged():
    """Setup-style refactor must keep checkpoint-compatible param paths."""
    model, _, params, *_ = _setup()
    assert set(params.keys()) == {"backbone", "fc2_primary", "fc2_auxiliary"}


def test_method_split_matches_joint_call():
    model, _, params, _, prim, aux, grid, _ = _setup()
    x = prim[:2, :INIT].transpose(0, 2, 3, 1, 4)
    xa = aux[:4, :INIT].transpose(0, 2, 3, 1, 4)
    g = jnp.broadcast_to(grid, (2, S, S, 2))
    ga = jnp.broadcast_to(grid, (4, S, S, 2))
    out_p, out_a = model.apply({"params": params}, x, g, xa, ga)
    out_p2 = model.apply({"params": params}, x, g, method="primary")
    out_a2 = model.apply({"params": params}, xa, ga, method="auxiliary")
    np.testing.assert_allclose(out_p, out_p2, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out_a, out_a2, rtol=1e-6, atol=1e-6)


def _one_step(step_fn, params, opt_state, prim, aux, grid, idx):
    # the step donates params/opt_state; feed it fresh copies
    params, opt_state = jax.tree.map(jnp.copy, (params, opt_state))
    p, _, (loss, lp, la), g_norm = step_fn(params, opt_state, prim, aux, grid, idx)
    return p, float(loss), float(g_norm)


def test_chunked_step_matches_unchunked():
    model, tx, params, opt_state, prim, aux, grid, idx = _setup()
    base, _ = build_aux_step(model, tx, INIT, ROLL, NA, 0.7)
    chunked, _ = build_aux_step(model, tx, INIT, ROLL, NA, 0.7, aux_chunks=4)
    p1, l1, g1 = _one_step(base, params, opt_state, prim, aux, grid, idx)
    p2, l2, g2 = _one_step(chunked, params, opt_state, prim, aux, grid, idx)
    assert np.isclose(l1, l2, rtol=1e-5)
    assert np.isclose(g1, g2, rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6), p1, p2
    )


def test_gather_resize_matches_pre_resized_store():
    """Low-res aux store + in-step upsample == full-res store, same grads."""
    model, tx, params, opt_state, prim, _, grid, idx = _setup()
    rng = np.random.default_rng(7)
    aux_lo = jnp.asarray(rng.normal(size=(8, T, S // 2, S // 2, C)).astype(np.float32))
    aux_hi = jax.image.resize(aux_lo, (8, T, S, S, C), method="linear")

    base, _ = build_aux_step(model, tx, INIT, ROLL, NA, 0.7)
    resized, _ = build_aux_step(
        model, tx, INIT, ROLL, NA, 0.7, aux_chunks=2, aux_resize_to=(S, S)
    )
    p1, l1, _ = _one_step(base, params, opt_state, prim, aux_hi, grid, idx)
    p2, l2, _ = _one_step(resized, params, opt_state, prim, aux_lo, grid, idx)
    assert np.isclose(l1, l2, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6), p1, p2
    )


def test_native_compute_runs_and_same_res_matches_joint():
    """aux_native_grid: aux stream at store res.  At a low-res store the
    step must run with finite loss; at the SAME res it must equal the
    joint concatenated pass exactly."""
    model, tx, params, opt_state, prim, aux, grid, idx = _setup()
    rng = np.random.default_rng(11)
    aux_lo = jnp.asarray(rng.normal(size=(8, T, S // 2, S // 2, C)).astype(np.float32))
    grid_lo = jax.image.resize(grid, (S // 2, S // 2, 2), method="linear")

    native, _ = build_aux_step(
        model, tx, INIT, ROLL, NA, 0.7, aux_chunks=2, aux_native_grid=grid_lo
    )
    p, l, g = _one_step(native, params, opt_state, prim, aux_lo, grid, idx)
    assert np.isfinite(l) and np.isfinite(g)

    # same-res store: native-compute path == joint pass
    base, _ = build_aux_step(model, tx, INIT, ROLL, NA, 0.7)
    native_same, _ = build_aux_step(
        model, tx, INIT, ROLL, NA, 0.7, aux_native_grid=grid
    )
    p1, l1, _ = _one_step(base, params, opt_state, prim, aux, grid, idx)
    p2, l2, _ = _one_step(native_same, params, opt_state, prim, aux, grid, idx)
    assert np.isclose(l1, l2, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6), p1, p2
    )


def test_step_xy_native_matches_device_gather():
    """Host-streamed native-res aux (step.xy + AuxHostWindowLoader) must
    equal the device-store native step on the same batch — the round-3
    composition for stores past one chip's HBM."""
    from sciml_pde_tpu.data.stream import AuxHostWindowLoader

    model, tx, params, opt_state, prim, _, grid, idx = _setup()
    rng = np.random.default_rng(13)
    aux_lo = jnp.asarray(rng.normal(size=(8, T, S // 2, S // 2, C)).astype(np.float32))
    grid_lo = jax.image.resize(grid, (S // 2, S // 2, 2), method="linear")

    native, _ = build_aux_step(
        model, tx, INIT, ROLL, NA, 0.7, aux_native_grid=grid_lo
    )
    p1, l1, g1 = _one_step(native, params, opt_state, prim, aux_lo, grid, idx)

    loader = AuxHostWindowLoader(
        np.asarray(prim), np.asarray(aux_lo), np.asarray(idx), INIT, ROLL,
        batch_size=len(idx), num_aux=NA, shuffle=False, prefetch=False,
    )
    x, y, xa, ya = next(iter(loader))
    params2, opt2 = jax.tree.map(jnp.copy, (params, opt_state))
    p2, _, (l2, _, _), g2 = native.xy(params2, opt2, x, y, xa, ya, grid)
    assert np.isclose(l1, float(l2), rtol=1e-5)
    assert np.isclose(g1, float(g2), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6), p1, p2
    )


def _write_ns_file(path, n_traj, n_frames, s, seed):
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        f["velocity"] = rng.normal(size=(n_traj, n_frames, s, s, 2)).astype(np.float32)
        f["particles"] = rng.normal(size=(n_traj, n_frames, s, s, 1)).astype(np.float32)
        f["t"] = np.tile(np.arange(n_frames, dtype=np.float32), (n_traj, 1))
        f["force"] = rng.normal(size=(n_traj, s, s, 2)).astype(np.float32)


def test_native_res_store_e2e(tmp_path):
    """Loader keeps the aux store at native res; training runs end to end."""
    for i in [0, 250]:
        _write_ns_file(tmp_path / f"ns_incom_inhom_2d_256-{i}.h5", 2, T, S, i)
    for i in range(2):
        _write_ns_file(tmp_path / f"ns_aux_2d_8-{i}.h5", 2, T, S // 2, 100 + i)

    from sciml_pde_tpu.data.ns import load_ns_aux

    ds = load_ns_aux(
        str(tmp_path), train_subsample=(1, 1, 2), num_aux_samples=2,
        initial_step=INIT, rollout_test=ROLL, test_range=(250, 251),
        aux_name="ns_aux_2d_8", aux_upsample_at_gather=True,
        aux_store_dtype="bf16",
    )
    assert ds.aux_train.data.shape[2:4] == (S // 2, S // 2)
    assert ds.aux_train.data.dtype == jnp.bfloat16

    res = run_training(
        base_path=str(tmp_path), dataset_family="ns", if_aux=True,
        train_subsample=(1, 1, 2), num_aux_samples=2, test_range=(250, 251),
        aux_name="ns_aux_2d_8", aux_upsample_at_gather=True,
        aux_store_dtype="bf16", aux_chunks=2,
        modes=4, width=8, initial_step=INIT, rollout_test=ROLL,
        num_channels=C, batch_size=4, epochs=1,
        run_dir=str(tmp_path / "run"), model_name="t_aux_native", log_every=1000,
    )
    assert np.isfinite(res.best_val)


def test_shard_store_with_chunked_upsampled_aux(tmp_path):
    """Composition: sharded trajectory store x scanned aux chunks x
    gather-time upsample, on the 8-device CPU mesh."""
    for i in [0, 1, 2, 3, 250]:
        _write_ns_file(tmp_path / f"ns_incom_inhom_2d_256-{i}.h5", 2, T, S, i)
    for i in range(8):
        _write_ns_file(tmp_path / f"ns_aux_2d_8-{i}.h5", 2, T, S // 2, 100 + i)

    res = run_training(
        base_path=str(tmp_path), dataset_family="ns", if_aux=True,
        train_subsample=(4, 4, 8), num_aux_samples=2, test_range=(250, 251),
        aux_name="ns_aux_2d_8", aux_upsample_at_gather=True, aux_chunks=2,
        shard_store=True,
        modes=4, width=8, initial_step=INIT, rollout_test=ROLL,
        num_channels=C, batch_size=8, epochs=1,
        run_dir=str(tmp_path / "run_sh"), model_name="t_aux_shard", log_every=1000,
    )
    assert np.isfinite(res.best_val)


def test_transformer_native_res_store_e2e(tmp_path):
    """Same lever in the transformer trainer (build_transformer_aux_step
    aux_resize_to): low-res aux store, in-step upsample."""
    from sciml_pde_tpu.train.transformer_train import run_transformer_training

    for i in [0, 250]:
        _write_ns_file(tmp_path / f"ns_incom_inhom_2d_256-{i}.h5", 2, T, S, i)
    for i in range(2):
        _write_ns_file(tmp_path / f"ns_aux_2d_8-{i}.h5", 2, T, S // 2, 100 + i)

    res = run_transformer_training(
        base_path=str(tmp_path), dataset_family="ns", if_aux=True,
        train_subsample=(1, 1, 2), num_aux_samples=2, test_range=(250, 251),
        aux_name="ns_aux_2d_8", aux_upsample_at_gather=True,
        aux_store_dtype="bf16",
        img_size=S, patch_size=8, tubelet_size=2, in_chans=C,
        encoder_embed_dim=32, encoder_depth=1, encoder_num_heads=4,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        initial_step=4, batch_size=4, epochs=1, bf16=False, log_every=1000,
        run_dir=str(tmp_path / "run_tf"), model_name="t_vmae_native",
    )
    assert np.isfinite(res.best_val)
