"""Chunked host->device transfer: bit-identical to a plain device_put."""

import jax.numpy as jnp
import numpy as np

from sciml_pde_tpu.utils.transfer import device_put_chunked


def test_small_array_passthrough():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = device_put_chunked(a)
    np.testing.assert_array_equal(np.asarray(out), a)


def test_chunked_with_ragged_tail():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 5, 3)).astype(np.float32)
    # row = 60 bytes; chunk 2 rows -> body 3x2 rows + tail of 1
    out = device_put_chunked(a, max_chunk_bytes=120)
    assert out.shape == a.shape and out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), a)


def test_exact_multiple_of_chunk():
    a = np.arange(6 * 4, dtype=np.int32).reshape(6, 4)
    out = device_put_chunked(a, max_chunk_bytes=32)  # 2 rows per chunk
    np.testing.assert_array_equal(np.asarray(out), a)


def test_device_array_returned_as_is():
    a = jnp.ones((4, 4))
    assert device_put_chunked(a) is a
