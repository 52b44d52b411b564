from sciml_pde_tpu.parallel.distributed import distributed_init, host_local_array
from sciml_pde_tpu.parallel.mesh import (
    MeshAxes,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    trajectory_sharding,
)

__all__ = [
    "MeshAxes",
    "distributed_init",
    "host_local_array",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "trajectory_sharding",
]
