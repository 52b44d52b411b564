"""Serving export round-trip: FNO forward and compiled rollout."""

import numpy as np
import jax
import jax.numpy as jnp

from sciml_pde_tpu.eval.rollout import rollout_predict
from sciml_pde_tpu.models import FNO2d
from sciml_pde_tpu.utils.export import export_apply, load_exported, save_exported


def _tiny_fno(nx=16, c=2, t=4):
    rng = np.random.default_rng(0)
    model = FNO2d(num_channels=c, modes1=4, modes2=4, width=8, initial_step=t)
    x = jnp.asarray(rng.normal(size=(2, nx, nx, t, c)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(size=(2, nx, nx, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, grid)["params"]
    return model, params, x, grid


def test_forward_roundtrip(tmp_path):
    model, params, x, grid = _tiny_fno()

    def fn(x, grid):
        return model.apply({"params": params}, x, grid)

    art = export_apply(fn, (x, grid), platforms=("cpu",))
    p = save_exported(art, tmp_path / "fno.stablehlo")
    served = load_exported(p)
    np.testing.assert_allclose(
        np.asarray(served(x, grid)), np.asarray(fn(x, grid)), rtol=2e-5, atol=2e-5
    )


def test_rollout_roundtrip(tmp_path):
    model, params, x, grid = _tiny_fno()
    steps = 3

    def unroll(x, grid):
        return rollout_predict(
            lambda a, g: model.apply({"params": params}, a, g), x, grid, steps
        )

    art = export_apply(unroll, (x, grid), platforms=("cpu",))
    p = save_exported(art, tmp_path / "fno_rollout.stablehlo")
    served = load_exported(p)
    out = np.asarray(served(x, grid))
    assert out.shape == x.shape[:3] + (steps, x.shape[-1])
    np.testing.assert_allclose(out, np.asarray(unroll(x, grid)), rtol=2e-5, atol=2e-5)


def test_multiplatform_artifact(tmp_path):
    """A (tpu, cpu) artifact must still execute on the CPU test mesh."""
    model, params, x, grid = _tiny_fno(nx=8, t=2)

    def fn(x, grid):
        return model.apply({"params": params}, x, grid)

    art = export_apply(fn, (x, grid))  # default platforms ("tpu", "cpu")
    served = load_exported(save_exported(art, tmp_path / "mp.stablehlo"))
    np.testing.assert_allclose(
        np.asarray(served(x, grid)), np.asarray(fn(x, grid)), rtol=2e-5, atol=2e-5
    )
