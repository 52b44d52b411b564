"""Coverage for rollout_experiment and prediction export."""

import json

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.data.windows import WindowedTrajectories
from sciml_pde_tpu.eval.prediction import export_rollout_trajectories
from sciml_pde_tpu.eval.rollout_experiment import rollout_study
from sciml_pde_tpu.models import FNO2d


def _fixture():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(3, 1, 12, 12, 2)).astype(np.float32)
    decay = np.exp(-0.1 * np.arange(10, dtype=np.float32))[None, :, None, None, None]
    data = jnp.asarray(base * decay)
    grid = jnp.asarray(rng.uniform(size=(12, 12, 2)).astype(np.float32))
    test = WindowedTrajectories(data, grid, initial_step=4, rollout=1, train=False)
    model = FNO2d(num_channels=2, modes1=3, modes2=3, width=8, initial_step=4)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 12, 12, 4, 2)), grid[None]
    )["params"]

    def apply_fn(p, x, g):
        return model.apply({"params": p}, x, g)

    return test, apply_fn, params


def test_rollout_study_horizons(tmp_path):
    test, apply_fn, params = _fixture()
    out = tmp_path / "study.json"
    res = rollout_study(apply_fn, params, test, horizons=(1, 2, 3), batch_size=3,
                        iLow=1, iHigh=3, out_path=out)
    assert sorted(res) == [1, 2, 3]
    assert all(np.isfinite(res[k]["nRMSE"]) for k in res)
    assert len(res[3]["mse_time"]) == 3
    loaded = json.loads(out.read_text())
    assert "1" in loaded


def test_export_rollout_trajectories(tmp_path):
    test, apply_fn, params = _fixture()
    paths = export_rollout_trajectories(
        apply_fn, params, test, steps=3, out_dir=tmp_path, prefix="pred", batch_size=2
    )
    assert len(paths) == 3
    with h5py.File(paths[0]) as f:
        assert f["data"].shape == (3, 12, 12, 2)
        assert np.isfinite(np.asarray(f["data"])).all()


def test_all_steps_score_is_cumulative_mean_of_finals():
    """The transformer reference scores the metric over ALL unrolled
    frames; by prefix consistency of autoregressive unrolls that equals
    the cumulative mean of the final-step-per-horizon numbers."""
    from sciml_pde_tpu.eval.rollout import evaluate_rollout

    test, apply_fn, params = _fixture()
    # need rollout room: rebuild the window set with rollout=3
    test3 = WindowedTrajectories(test.data, test.grid, initial_step=4,
                                 rollout=3, train=False)
    finals = [evaluate_rollout(apply_fn, test3, rollout_test=k, batch_size=3,
                               iLow=1, iHigh=3, params=params)["nRMSE"]
              for k in (1, 2, 3)]
    all3 = evaluate_rollout(apply_fn, test3, rollout_test=3, batch_size=3,
                            iLow=1, iHigh=3, params=params,
                            score="all_steps")["nRMSE"]
    np.testing.assert_allclose(all3, np.mean(finals), rtol=1e-5)


def test_rollout_study_does_not_capture_store_as_constant():
    """Regression: the fused study once closed over the trajectory store,
    embedding it as a compile-time constant (3.15 GB at NS production
    shape).  JAX warns when captured constants exceed the configured
    threshold — set it below the store size and assert silence."""
    import warnings

    test, apply_fn, params = _fixture()
    store_bytes = test.data.size * test.data.dtype.itemsize
    old = jax.config.jax_captured_constants_warn_bytes
    try:
        jax.config.update("jax_captured_constants_warn_bytes", store_bytes // 2)
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            res = rollout_study(apply_fn, params, test, horizons=(1, 2),
                                batch_size=3, iLow=1, iHigh=3)
    finally:
        jax.config.update("jax_captured_constants_warn_bytes", old)
    assert np.isfinite(res[1]["nRMSE"])
