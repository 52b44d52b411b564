"""Bounded-memory host->device transfer for large trajectory stores.

A single ``device_put``/``jnp.asarray`` of a multi-GB array makes the
remote-backend client stage serialization buffers of ~6x the payload in
host RAM (PERFORMANCE.md backend notes: a ~14 GB NS aux store set climbed
past 82 GB RSS and OOM-killed a 125 GB host).  ``device_put_chunked``
streams the array in leading-axis chunks into a preallocated device
buffer through a donated ``dynamic_update_slice`` program, so

  host transient  ~= blowup x chunk_bytes   (not x total bytes)
  device peak     ~= total + one chunk      (donation updates in place)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_CHUNK_BYTES = 1 << 30  # 1 GiB


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_chunk(buf: jnp.ndarray, chunk: jnp.ndarray, start: jnp.ndarray):
    idx = (start,) + (jnp.int32(0),) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, chunk, idx)


def device_put_chunked(
    arr, max_chunk_bytes: int = _DEFAULT_CHUNK_BYTES
) -> jnp.ndarray:
    """Transfer ``arr`` to the default device in bounded chunks.

    Equivalent to ``jnp.asarray(arr)`` for anything at or below
    ``max_chunk_bytes`` (including already-device arrays, returned as-is).
    """
    if isinstance(arr, jax.Array):
        return arr
    arr = np.ascontiguousarray(arr)
    if arr.nbytes <= max_chunk_bytes or arr.ndim == 0 or arr.shape[0] <= 1:
        return jnp.asarray(arr)
    row_bytes = max(arr.nbytes // arr.shape[0], 1)
    rows = max(int(max_chunk_bytes // row_bytes), 1)
    buf = jnp.zeros(arr.shape, dtype=arr.dtype)
    # fixed chunk shape -> one compiled update program for the body plus
    # (at most) one more for the ragged tail
    n = arr.shape[0]
    main_end = (n // rows) * rows
    for i in range(0, main_end, rows):
        buf = _write_chunk(buf, jnp.asarray(arr[i : i + rows]), jnp.int32(i))
    if main_end < n:
        tail = jnp.asarray(arr[main_end:])
        buf = _write_chunk(buf, tail, jnp.int32(main_end))
    return jax.block_until_ready(buf)
