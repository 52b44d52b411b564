"""NS dataset generation -> loading -> aux/Lie training, end to end (tiny)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sciml_pde_tpu.sim.ns_incomp_2d import NSIncompConfig
from sciml_pde_tpu.sim.gen_ns_incomp import generate_ns_file, VARIANTS
from sciml_pde_tpu.sim.lie import augment_ns_window, lie_trotter_exp, sample_strengths
from sciml_pde_tpu.data.ns import load_ns_aux, load_ns_baseline
from sciml_pde_tpu.train.fno_train import run_training

pytestmark = pytest.mark.slow

TINY = dict(
    grid_size=(16, 16), dt=1e-3, n_steps=16, frame_int=2, n_batch=2,
    nu=0.01, cg_tol=1e-4, cg_max_iter=200,
)


@pytest.fixture(scope="module")
def ns_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("ns")
    # 2 train primary files + 1 "test" file at index 250; 4 aux files
    for i in [0, 1, 250]:
        generate_ns_file(folder / f"ns_incom_inhom_2d_256-{i}.h5", i, NSIncompConfig(**TINY))
    aux_cfg = NSIncompConfig(**{**TINY, **VARIANTS["convection"]})
    for i in range(4):
        generate_ns_file(folder / f"ns_aux_2d_256-{i}.h5", 100 + i, aux_cfg)
    for i in [250]:
        generate_ns_file(folder / f"ns_aux_2d_256-{i}.h5", 200 + i, aux_cfg)
    return folder


def test_load_ns_aux_pairing(ns_folder):
    ds = load_ns_aux(
        str(ns_folder), train_subsample=(2, 2, 4), num_aux_samples=2,
        initial_step=3, rollout_test=1, test_range=(250, 251),
    )
    # 2 files x 2 traj = 4 primary rows; aux rows: file f -> aux files 2f,2f+1
    assert ds.primary_train.num_trajectories == 4
    assert ds.aux_train.num_trajectories == 8
    np.testing.assert_array_equal(ds.aux_row_map[0], [0, 2])   # f=0,b=0 -> files 0,1 traj 0
    np.testing.assert_array_equal(ds.aux_row_map[1], [1, 3])   # f=0,b=1
    np.testing.assert_array_equal(ds.aux_row_map[2], [4, 6])   # f=1,b=0 -> files 2,3
    assert ds.primary_train.data.shape[-1] == 3  # velocity + particles


def test_ns_aux_training_runs(ns_folder, tmp_path):
    res = run_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(2, 2, 4), num_aux_samples=2,
        test_range=(250, 251),
        modes=4, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_ns_aux", log_every=1000,
    )
    assert np.isfinite(res.best_val)
    assert len(res.history) == 2


def test_ns_aux_training_runs_bf16_stores_remat(ns_folder, tmp_path):
    """Both device stores in bf16 + remat'd backbone: the HBM-fit path for
    reference-batch aux training (compute stays fp32 from the gather on)."""
    res = run_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=True,
        train_subsample=(2, 2, 4), num_aux_samples=2,
        test_range=(250, 251),
        aux_store_dtype="bf16", primary_store_dtype="bf16", fno_remat=True,
        modes=4, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_ns_aux_bf16", log_every=1000,
    )
    assert np.isfinite(res.best_val)


def test_ns_baseline_bf16_store_training_runs(ns_folder, tmp_path):
    """Baseline twin of the bf16-store path (the ds32 8-primary-file
    baseline is 25.2 GB fp32 — past HBM — vs 12.6 GB bf16): the store
    loads in bf16, every gather casts back to fp32, and the val metric
    matches the fp32-store run to bf16-quantization error."""
    import ml_dtypes

    from sciml_pde_tpu.data.ns import load_ns_baseline

    ds = load_ns_baseline(
        str(ns_folder), train_subsample=2, initial_step=3, rollout_test=1,
        test_range=(250, 251), store_dtype="bf16",
    )
    assert ds.train.data.dtype == ml_dtypes.bfloat16
    assert ds.test.data.dtype == np.float32  # test store / metrics stay fp32

    kw = dict(
        base_path=str(ns_folder), dataset_family="ns", if_aux=False,
        train_subsample=(2, 2, 4), test_range=(250, 251),
        modes=4, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2, log_every=1000,
    )
    res16 = run_training(primary_store_dtype="bf16", run_dir=str(tmp_path),
                         model_name="t_ns_b16", **kw)
    res32 = run_training(run_dir=str(tmp_path), model_name="t_ns_b32", **kw)
    assert np.isfinite(res16.best_val)
    # same seed/data/steps: only the store quantization differs
    assert abs(res16.best_val - res32.best_val) < 0.1 * abs(res32.best_val) + 1e-3


def test_ns_baseline_lie_training_runs(ns_folder, tmp_path):
    res = run_training(
        base_path=str(ns_folder), dataset_family="ns", if_aux=False,
        lie_augment=True, train_subsample=(2, 2, 4),
        test_range=(250, 251),
        modes=4, width=8, initial_step=3, rollout_test=1,
        num_channels=3, batch_size=8, epochs=2,
        run_dir=str(tmp_path), model_name="t_ns_lie", log_every=1000,
    )
    assert np.isfinite(res.best_val)


def test_lie_zero_strength_is_identity():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(8, 8, 4, 3)).astype(np.float32))
    t = x = y = jnp.zeros((8, 8, 4))
    out = lie_trotter_exp((t, x, y, w[..., 0], w[..., 1]), jnp.zeros(9), order=2, steps=2)
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(w[..., 0]), atol=1e-6)


def test_lie_rotation_only_rotates_velocity():
    # group 5 with angle theta rotates (u, v) exactly when other strengths are 0
    theta = 0.3
    strengths = jnp.zeros(9).at[4].set(theta)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(4, 4, 2)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(4, 4, 2)).astype(np.float32))
    zero = jnp.zeros_like(u)
    _, _, _, u2, v2 = lie_trotter_exp((zero, zero, zero, u, v), strengths, order=2, steps=1)
    np.testing.assert_allclose(
        np.asarray(u2), np.asarray(jnp.cos(theta) * u - jnp.sin(theta) * v), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(v2), np.asarray(jnp.sin(theta) * u + jnp.cos(theta) * v), atol=1e-5
    )


def test_augment_preserves_shape_and_particles():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(8, 8, 4, 3)).astype(np.float32))
    out = augment_ns_window(w, jax.random.PRNGKey(0))
    assert out.shape == w.shape
    np.testing.assert_array_equal(np.asarray(out[..., 2]), np.asarray(w[..., 2]))
