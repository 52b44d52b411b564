from sciml_pde_tpu.io.h5 import (
    write_seed_group,
    list_seed_groups,
    read_seed_data,
    read_seed_grid,
)

__all__ = [
    "write_seed_group",
    "list_seed_groups",
    "read_seed_data",
    "read_seed_grid",
]
