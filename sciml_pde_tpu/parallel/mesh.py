"""Device mesh construction and sharding helpers.

The reference's only device-to-device communication is ``nn.DataParallel``
(NCCL scatter/gather per step, e.g.
``Transformer_2D_NS/Ours/train_transformer_aux_ns.py:137-139``).  The
TPU-native replacement is a single jitted program whose batch dimension is
sharded over an ICI mesh axis; XLA inserts the gradient all-reduces.  These
helpers centralise the axis-name conventions so models/trainers never spell
raw device lists.

Axis conventions:
  - ``data``:  batch / data parallelism (ICI within a slice, DCN across).
  - ``model``: optional tensor parallelism (FNO channel dim / attention heads).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    model: str = "model"


AXES = MeshAxes()


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    ``data=-1`` consumes all remaining devices.  With a single device this
    still returns a valid 1x1 mesh so every code path is mesh-driven and the
    same program scales from 1 chip to a pod without change.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, (AXES.data, AXES.model))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Sharding with leading (batch) axis split over the 'data' mesh axis."""
    spec = P(AXES.data, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def trajectory_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a trajectory store split over the 'data' axis.

    Each data-parallel shard holds ``N / n_data`` whole trajectories —
    the HBM-residency lever for stores that exceed one chip's memory
    (each chip holds 1/n of the dataset instead of a full replica).
    """
    return NamedSharding(mesh, P(AXES.data))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with axis 0 sharded over 'data'.

    Falls back to replication when the batch does not divide the data axis
    (tiny debug batches on a large mesh) — correctness is unchanged, only
    the sharding differs.
    """
    n = mesh.shape[AXES.data]

    def _put(x):
        x = np.asarray(x)
        if x.shape[0] % n != 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / opt state) over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[AXES.data]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
