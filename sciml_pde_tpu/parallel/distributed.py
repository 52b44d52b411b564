"""Multi-process / multi-host bootstrap (DCN story, SURVEY.md section 2.6).

The reference's only multi-device story is single-process
``nn.DataParallel`` (plus dead NCCL env keys in its sweep scripts); the
TPU-native equivalent of "many hosts, one program" is JAX multi-controller
SPMD: every process runs the SAME jitted program over a GLOBAL mesh, and
XLA routes collectives over ICI within a slice and DCN across slices.

Usage (same code on every host):

    from sciml_pde_tpu.parallel import distributed_init, make_mesh

    distributed_init()              # TPU pods: args auto-detected
    mesh = make_mesh()              # global mesh over ALL processes' chips
    batch = host_local_array(local_batch, mesh)   # per-host shard -> global

``distributed_init`` wraps ``jax.distributed.initialize``; on TPU pods all
arguments are discovered from the runtime environment, while CPU/GPU
clusters pass coordinator/process explicitly (the two-process CPU test in
``tests/test_distributed.py`` drives exactly that path).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Sequence[int] | None = None,
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    After this, ``jax.devices()`` lists EVERY process's devices and
    ``make_mesh()`` builds the global mesh; ``jax.local_devices()`` stays
    process-local.  On TPU pods call with no arguments.
    """
    # idempotence probe must not touch the backend (jax.process_count()
    # would initialise XLA and forbid the initialize below)
    if getattr(jax._src.distributed.global_state, "client", None) is not None:
        return  # already initialized
    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def host_local_array(local_batch: Any, mesh, sharding=None):
    """Assemble a global batch-sharded array from per-process local data.

    Each process passes ITS shard of the batch (e.g. the windows its own
    data loader produced); the result is a global ``jax.Array`` sharded
    over the mesh's 'data' axis, ready for the jitted train step.  This is
    the multi-host replacement for ``shard_batch`` (which assumes one
    process can see the whole batch).
    """
    from sciml_pde_tpu.parallel.mesh import batch_sharding

    local = np.asarray(local_batch)
    if sharding is None:
        sharding = batch_sharding(mesh, ndim=local.ndim)
    return jax.make_array_from_process_local_data(sharding, local)
