"""Fast fused training step (train/fast_step.py) vs the production step.

The fast step must be a drop-in replacement for build_baseline_step's
single-rollout training: same gather semantics, same loss, same adaptive
clip + weight decay + Adam + cosine schedule — asserted by running both
from identical initialization on identical window batches and comparing
the loss/grad-norm trajectory and the final parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sciml_pde_tpu.models import FNO2d
from sciml_pde_tpu.train.fno_train import build_baseline_step
from sciml_pde_tpu.train.fast_step import (
    build_fast_baseline_step,
    fast_state_from_tree,
    init_opt,
    tree_from_fast_state,
)
from sciml_pde_tpu.train.optim import make_optimizer

N, T, X, Y, C = 3, 8, 16, 16, 2
MODES, WIDTH, T0 = 4, 8, 3
LR, TOTAL = 1e-3, 50
B = 2


@pytest.fixture(scope="module", autouse=True)
def _exact_precision():
    """Pin f32 dots: the drop-in-replacement property under test is
    structural; the shipped bf16 default casts the fused path's dot
    inputs even on CPU while the XLA production path stays f32 there."""
    from sciml_pde_tpu.ops import spectral as _spec

    prev = _spec._PRECISION
    _spec.set_dft_precision("highest")
    yield
    _spec._PRECISION = prev


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=(N, T, X, Y, C)).astype(np.float32))
    gx, gy = np.meshgrid(
        np.linspace(0, 1, X, dtype=np.float32),
        np.linspace(0, 1, Y, dtype=np.float32), indexing="ij",
    )
    grid = jnp.asarray(np.stack([gx, gy], -1))
    idxs = [
        jnp.asarray(np.stack([rng.integers(0, N, B),
                              rng.integers(0, T - T0 - 1, B)], 1).astype(np.int32))
        for _ in range(5)
    ]
    model = FNO2d(num_channels=C, modes1=MODES, modes2=MODES, width=WIDTH,
                  initial_step=T0)
    x0 = jnp.zeros((1, X, Y, T0, C), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, grid[None])["params"]
    return data, grid, idxs, model, params


def test_fast_step_matches_production(setup):
    data, grid, idxs, model, params = setup

    tx = make_optimizer(LR, total_steps=TOTAL)
    step_fn, _ = build_baseline_step(model, tx, T0, rollout=1)
    # both steps donate their state; keep the shared fixture intact
    p_prod = jax.tree_util.tree_map(jnp.copy, params)
    opt_prod = tx.init(p_prod)
    key = jax.random.PRNGKey(0)

    theta, spec = fast_state_from_tree(params, MODES)
    fstep, _ = build_fast_baseline_step(MODES, T0, spec, LR, TOTAL)
    opt_fast = init_opt(theta)
    grid2 = jnp.transpose(grid, (2, 0, 1))

    for k, idx in enumerate(idxs):
        p_prod, opt_prod, loss_p, gn_p = step_fn(
            p_prod, opt_prod, data, grid, idx, key
        )
        theta, opt_fast, loss_f, gn_f = fstep(theta, opt_fast, data, grid2, idx)
        np.testing.assert_allclose(
            float(loss_f), float(loss_p), rtol=2e-3,
            err_msg=f"loss diverged at step {k}",
        )
        np.testing.assert_allclose(
            float(gn_f), float(gn_p), rtol=2e-3,
            err_msg=f"grad norm diverged at step {k}",
        )

    got = tree_from_fast_state(theta, spec, MODES, params)
    for path, want in jax.tree_util.tree_leaves_with_path(p_prod):
        have = dict(jax.tree_util.tree_leaves_with_path(got))[path]
        np.testing.assert_allclose(
            np.asarray(have), np.asarray(want), rtol=5e-3, atol=1e-5,
            err_msg=f"params diverged at {jax.tree_util.keystr(path)}",
        )


def test_fast_scan_matches_single_steps(setup):
    data, grid, idxs, model, params = setup
    theta0, spec = fast_state_from_tree(params, MODES)
    fstep, fscan = build_fast_baseline_step(MODES, T0, spec, LR, TOTAL)
    grid2 = jnp.transpose(grid, (2, 0, 1))

    # the steps donate their state: give each run its own copy
    theta_a, opt_a = jnp.copy(theta0), init_opt(theta0)
    losses_a = []
    for idx in idxs:
        theta_a, opt_a, loss, _ = fstep(theta_a, opt_a, data, grid2, idx)
        losses_a.append(float(loss))

    theta_b, opt_b = jnp.copy(theta0), init_opt(theta0)
    chunk = jnp.stack(idxs)
    theta_b, opt_b, losses_b, _ = fscan(theta_b, opt_b, data, grid2, chunk)
    np.testing.assert_allclose(
        np.asarray(losses_b), np.asarray(losses_a), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(theta_b), np.asarray(theta_a), rtol=1e-4, atol=1e-6
    )


def test_run_training_fast_step_matches_slow(tmp_path):
    """run_training(fast_step=True) must reproduce the slow path's
    training trajectory on the DR family (same seeds, same batches)."""
    import h5py

    from sciml_pde_tpu.train.fno_train import run_training

    folder = tmp_path / "data"
    folder.mkdir()
    rng = np.random.default_rng(0)
    with h5py.File(folder / "2D_diff-react_test_all.h5", "w") as f:
        for s in range(10):
            g = f.create_group(f"{s:04d}")
            g.create_dataset(
                "data", data=rng.normal(size=(12, 16, 16, 2)).astype(np.float32)
            )
            gr = g.create_group("grid")
            gr.create_dataset("x", data=np.linspace(0, 1, 16, dtype=np.float32))
            gr.create_dataset("y", data=np.linspace(0, 1, 16, dtype=np.float32))
            gr.create_dataset("t", data=np.linspace(0, 1, 12, dtype=np.float32))

    common = dict(
        base_path=str(folder) + "/", if_aux=False, train_subsample=(4, 2, 6),
        modes=4, width=8, initial_step=5, rollout_test=1, num_channels=2,
        batch_size=4, epochs=2, learning_rate=2e-3, run_dir=str(tmp_path),
        log_every=0, seed=3,
    )
    res_slow = run_training(model_name="fs_slow", fast_step=False, **common)
    res_fast = run_training(model_name="fs_fast", fast_step=True, **common)

    assert len(res_fast.history) == len(res_slow.history)
    for hf, hs in zip(res_fast.history, res_slow.history):
        np.testing.assert_allclose(hf["train_loss"], hs["train_loss"], rtol=3e-3)
        np.testing.assert_allclose(hf["val_loss"], hs["val_loss"], rtol=3e-3)
    # returned params are the flax TREE in both modes
    for path, want in jax.tree_util.tree_leaves_with_path(res_slow.params):
        have = dict(jax.tree_util.tree_leaves_with_path(res_fast.params))[path]
        assert have.shape == want.shape


def test_run_training_fast_step_rejects_unsupported(tmp_path):
    from sciml_pde_tpu.train.fno_train import run_training

    with pytest.raises(ValueError, match="fast_step"):
        run_training(
            base_path=str(tmp_path), if_aux=False, fast_step=True,
            training_type="autoregressive", run_dir=str(tmp_path),
        )
