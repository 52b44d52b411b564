"""Host-streaming window loader + xy train-step variant."""

import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.stream import HostWindowLoader
from sciml_pde_tpu.data.windows import WindowedTrajectories, gather_windows
from sciml_pde_tpu.models import FNO2d
from sciml_pde_tpu.train.fno_train import build_baseline_step
from sciml_pde_tpu.train.optim import make_optimizer

import jax


def test_host_loader_matches_device_gather():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(3, 10, 6, 6, 2)).astype(np.float32)
    idx = np.array([[0, 0], [1, 3], [2, 5], [0, 2]], np.int32)
    loader = HostWindowLoader(data, idx, initial_step=4, rollout=1,
                              batch_size=4, shuffle=False)
    x, y = next(iter(loader))
    xd, yd = gather_windows(jnp.asarray(data), jnp.asarray(idx), 4, 1)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xd), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yd), rtol=1e-6)
    assert len(loader) == 1


def test_xy_step_trains():
    rng = np.random.default_rng(1)
    # learnable dynamics: smooth per-trajectory fields decaying in time
    base = rng.normal(size=(3, 1, 8, 8, 2)).astype(np.float32)
    decay = np.exp(-0.15 * np.arange(10, dtype=np.float32))[None, :, None, None, None]
    data = (base * decay).astype(np.float32)
    grid = jnp.asarray(rng.uniform(size=(8, 8, 2)).astype(np.float32))
    idx = np.stack([np.repeat(np.arange(3), 6), np.tile(np.arange(6), 3)], 1).astype(np.int32)

    model = FNO2d(num_channels=2, modes1=3, modes2=3, width=8, initial_step=4)
    tx = make_optimizer(1e-3, 100)
    step_fn, _ = build_baseline_step(model, tx, 4, 1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4, 2)), grid[None])["params"]
    opt_state = tx.init(params)

    loader = HostWindowLoader(data, idx, 4, 1, batch_size=6, seed=0)
    losses = []
    key = jax.random.PRNGKey(0)
    for ep in range(15):
        for x, y in loader:
            params, opt_state, loss, _ = step_fn.xy(params, opt_state, x, y, grid, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_scan_chunk_matches_sequential_steps():
    """step.scan (K steps in one dispatch) reproduces K sequential step()
    calls exactly when augmentation is off (same index sequence)."""
    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.normal(size=(3, 10, 8, 8, 2)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(size=(8, 8, 2)).astype(np.float32))
    idx_chunk = np.stack(
        [rng.integers(0, 3, (4, 2)), rng.integers(0, 5, (4, 2))], axis=2
    ).astype(np.int32)

    model = FNO2d(num_channels=2, modes1=3, modes2=3, width=8, initial_step=4)
    tx = make_optimizer(1e-3, 100)
    step_fn, _ = build_baseline_step(model, tx, 4, 1)
    params0 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4, 2)), grid[None]
    )["params"]
    key = jax.random.PRNGKey(0)

    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    p_scan0 = copy(params0)  # params0 is donated by the sequential loop below
    p_seq, o_seq = params0, tx.init(params0)
    seq_losses = []
    for k in range(4):
        p_seq, o_seq, loss, _ = step_fn(
            p_seq, o_seq, data, grid, jnp.asarray(idx_chunk[k]), key
        )
        seq_losses.append(float(loss))

    p_scan, o_scan, losses, g_norms = step_fn.scan(
        p_scan0, tx.init(p_scan0), data, grid, jnp.asarray(idx_chunk), key
    )
    np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=1e-5)
    flat_seq = jax.tree_util.tree_leaves(p_seq)
    flat_scan = jax.tree_util.tree_leaves(p_scan)
    for a, b in zip(flat_seq, flat_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
    assert losses.shape == (4,) and g_norms.shape == (4,)
