"""Optional tensor parallelism: channel-dim sharding over the 'model' axis.

The reference has no TP (SURVEY.md §2.6 — only DataParallel); this is the
TPU-native *extension point*: FNO channel dims / attention heads shard over
the second mesh axis, with XLA GSPMD propagating the activation shardings
and inserting the collectives.  Parameters get NamedShardings from simple
path rules; everything else is unchanged — the same jitted step runs DP,
TP, or DPxTP depending only on the mesh and these placements.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sciml_pde_tpu.parallel.mesh import AXES


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def fno_tp_rules(path, leaf, mesh: Mesh) -> NamedSharding:
    """Sharding rule for FNO params.

    - spectral weights (2, Cin, Cout, m1[, m2[, m3]]): shard Cout (axis 2);
    - Dense kernels (fan_in, fan_out): shard fan_out;
    - biases (fan_out,): shard when divisible;
    - everything else replicated.
    """
    n = mesh.shape[AXES.model]
    name = _path_str(path)
    shape = np.shape(leaf)
    if n > 1:
        if ("/w1" in name or "/w2" in name or "/w3" in name or "/w4" in name) and len(shape) >= 4:
            if shape[2] % n == 0:
                spec = [None] * len(shape)
                spec[2] = AXES.model
                return NamedSharding(mesh, P(*spec))
        elif name.endswith("kernel") and len(shape) == 2 and shape[1] % n == 0:
            return NamedSharding(mesh, P(None, AXES.model))
        elif name.endswith("bias") and len(shape) == 1 and shape[0] % n == 0:
            return NamedSharding(mesh, P(AXES.model))
    return NamedSharding(mesh, P())


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place FNO params with channel-dim TP over the 'model' axis."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, fno_tp_rules(path, leaf, mesh)), params
    )
