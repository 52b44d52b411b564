import jax
import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.parallel import make_mesh, shard_batch, replicate, batch_sharding


def test_make_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    assert mesh.shape["model"] == 1


def test_shard_batch_and_psum_equivalent():
    mesh = make_mesh()
    n = mesh.shape["data"]
    x = np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec[0] == "data"

    # a jitted global-batch reduction must equal the host reduction
    s = jax.jit(lambda a: jnp.sum(a))(xs)
    np.testing.assert_allclose(float(s), x.sum(), rtol=1e-6)


def test_replicate():
    mesh = make_mesh()
    p = {"w": np.ones((4, 4), np.float32)}
    pr = replicate(p, mesh)
    assert pr["w"].sharding.is_fully_replicated


def test_batch_sharding_spec_ndim():
    mesh = make_mesh()
    sh = batch_sharding(mesh, ndim=3)
    assert sh.spec == jax.sharding.PartitionSpec("data", None, None)
