"""Sharded trajectory store: gather equivalence, sampler invariants, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.data.windows import (
    gather_windows,
    sharded_epoch_batches,
    sharded_gather_windows,
)
from sciml_pde_tpu.parallel import make_mesh, trajectory_sharding
from sciml_pde_tpu.sim.diff_react import DiffReactConfig
from sciml_pde_tpu.sim.gen_diff_react import generate_dataset

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dr_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("dr_shard")
    cfg = dict(xdim=12, ydim=12, t=1.0, tdim=11)
    # device_batch >= nsample: one sim compile per file instead of one per
    # chunk size (this fixture was the suite's single slowest setup)
    # 9 seeds -> 90/10 split keeps 8 train (divisible by 4 shards)
    generate_dataset(
        folder / "2D_diff-react_test_all.h5", 9,
        DiffReactConfig(sim_type="all", **cfg), verbose=False, device_batch=28,
    )
    # 28 seeds -> 25 in the aux train pool (need 8 primaries x 3 aux = 24)
    generate_dataset(
        folder / "2D_diff-react_test_diff.h5", 28,
        DiffReactConfig(sim_type="diff", **cfg), verbose=False, device_batch=28,
    )
    return str(folder) + "/"


def _mesh_or_skip(n=4):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(data=n, devices=jax.devices()[:n])


def test_sharded_gather_matches_plain():
    mesh = _mesh_or_skip(4)
    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 12, 6, 6, 2)).astype(np.float32)
    # batch of 8 windows, shard-major: rows 2k, 2k+1 use shard k's
    # trajectories (local ids 0/1 map to global 2k/2k+1)
    local_idx = np.array(
        [[0, 1], [1, 3], [0, 0], [1, 2], [0, 5], [1, 1], [0, 2], [1, 0]],
        dtype=np.int32,
    )
    global_idx = local_idx.copy()
    for s in range(4):
        global_idx[2 * s : 2 * s + 2, 0] += s * 2

    want_x, want_y = gather_windows(jnp.asarray(data), jnp.asarray(global_idx), 3, 2)

    dsh = jax.device_put(jnp.asarray(data), trajectory_sharding(mesh))
    got_x, got_y = sharded_gather_windows(dsh, jnp.asarray(local_idx), 3, 2, mesh)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y), rtol=1e-6)


def test_sharded_epoch_batches_invariants():
    n_traj, n_shards, bs = 8, 4, 8
    w = 5  # windows per trajectory
    traj = np.repeat(np.arange(n_traj, dtype=np.int32), w)
    t0 = np.tile(np.arange(w, dtype=np.int32), n_traj)
    index = np.stack([traj, t0], axis=1)
    rng = np.random.default_rng(1)
    per_shard = n_traj // n_shards
    seen = 0
    for batch in sharded_epoch_batches(index, bs, n_traj, n_shards, rng):
        assert batch.shape == (bs, 2)
        # shard-major: slice s holds local ids < per_shard
        for s in range(n_shards):
            sl = batch[s * (bs // n_shards) : (s + 1) * (bs // n_shards)]
            assert np.all(sl[:, 0] >= 0) and np.all(sl[:, 0] < per_shard)
        seen += bs
    # covers (almost) the whole pool each epoch
    assert seen == (n_traj * w // bs) * bs

    with pytest.raises(ValueError):
        next(sharded_epoch_batches(index, 6, n_traj, 4, rng))


def test_shard_store_training_e2e(dr_folder, tmp_path):
    from sciml_pde_tpu.train.fno_train import run_training

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    res = run_training(
        base_path=str(dr_folder), aux_path=str(dr_folder),
        train_subsample=(8, 4, 12), if_aux=False, epochs=2, batch_size=8,
        modes=4, width=8, initial_step=5, run_dir=str(tmp_path),
        model_name="shard_base", shard_store=True, log_every=0,
    )
    assert np.isfinite(res.best_val)

    res = run_training(
        base_path=str(dr_folder), aux_path=str(dr_folder),
        train_subsample=(8, 8, 24), if_aux=True, num_aux_samples=3,
        epochs=2, batch_size=8, modes=4, width=8, initial_step=5,
        run_dir=str(tmp_path), model_name="shard_aux", shard_store=True,
        log_every=0,
    )
    assert np.isfinite(res.best_val)


@pytest.fixture(scope="module")
def ns_folder(tmp_path_factory):
    from sciml_pde_tpu.sim.gen_ns_incomp import VARIANTS, generate_ns_file
    from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig

    tiny = dict(
        grid_size=(16, 16), dt=1e-3, n_steps=16, frame_int=2, n_batch=2,
        nu=0.01, cg_tol=1e-4, cg_max_iter=200,
    )
    folder = tmp_path_factory.mktemp("ns_shard")
    # 4 primary files x 2 traj = 8 primary rows (divisible by the 8-device
    # CPU mesh); aux pairing needs files f*2+j -> 8 aux files
    for i in [0, 1, 2, 3, 250]:
        generate_ns_file(folder / f"ns_incom_inhom_2d_256-{i}.h5", i,
                         NSIncompConfig(**tiny))
    aux_cfg = NSIncompConfig(**{**tiny, **VARIANTS["convection"]})
    for i in range(8):
        generate_ns_file(folder / f"ns_aux_2d_256-{i}.h5", 100 + i, aux_cfg)
    generate_ns_file(folder / "ns_aux_2d_256-250.h5", 300, aux_cfg)
    return folder


def test_shard_store_ns_aux_row_map_e2e(ns_folder, tmp_path):
    """NS per-file aux pairing under a sharded store: the trainer re-lays
    the aux store into row-map order so each shard's primaries own the
    matching contiguous aux slice (2 files x 2 traj = 4 primary rows on a
    4-shard mesh)."""
    from sciml_pde_tpu.train.fno_train import run_training

    if len(jax.devices()) != 8:
        pytest.skip("needs the 8-device CPU mesh")
    res = run_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(4, 4, 8), num_aux_samples=2, test_range=(250, 251),
        modes=4, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_ns_shard_aux", log_every=0,
        shard_store=True,
    )
    assert np.isfinite(res.best_val)
