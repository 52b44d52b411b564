"""Tensor-parallel param sharding: DPxTP == DP results, correct placements."""

import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.models import FNO2d
from sciml_pde_tpu.parallel import make_mesh, replicate
from sciml_pde_tpu.parallel.tp import shard_params_tp


def _setup(mesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 4, 2)).astype(np.float32))
    g = jnp.asarray(rng.uniform(size=(4, 16, 16, 2)).astype(np.float32))
    model = FNO2d(num_channels=2, modes1=4, modes2=4, width=8, initial_step=4)
    params = model.init(jax.random.PRNGKey(0), x, g)["params"]
    return model, params, x, g


def test_tp_sharding_placements():
    mesh = make_mesh(data=4, model=2)
    model, params, x, g = _setup(mesh)
    sharded = shard_params_tp(params, mesh)
    # spectral weight Cout axis sharded over model
    w1 = sharded["backbone"]["conv0"]["w1"]
    assert w1.sharding.spec[2] == "model"
    # dense kernel out axis sharded
    k = sharded["backbone"]["fc0"]["Dense_0"]["kernel"]
    assert k.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_tp_forward_matches_replicated():
    mesh_tp = make_mesh(data=4, model=2)
    model, params, x, g = _setup(mesh_tp)
    y_tp = jax.jit(lambda p, x, g: model.apply({"params": p}, x, g))(
        shard_params_tp(params, mesh_tp), x, g
    )
    mesh_dp = make_mesh()
    y_dp = jax.jit(lambda p, x, g: model.apply({"params": p}, x, g))(
        replicate(params, mesh_dp), x, g
    )
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_dp), atol=2e-5)
