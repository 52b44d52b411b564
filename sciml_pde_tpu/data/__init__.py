"""Dataset/loading layer (L2 of SURVEY.md).

TPU-first redesign of the reference's ``torch.utils.data.Dataset``
families (``pdebench/models/fno_aux/utils_2d_ns.py``, ``utils_2d_rd.py``,
``utils_3d_ns.py`` and friends): instead of per-window lazy HDF5 reads in
DataLoader worker processes, each dataset is loaded once into an
HBM-resident trajectory store ``(N, T, *spatial, C)`` and training steps
gather windows *on device* from integer ``(traj, t0)`` indices inside the
jitted program.  The host never touches field data during training; only
tiny index arrays cross the host->device boundary per step.

Modules:
  windows  -- WindowedTrajectories store + on-device gather + batching
  dr       -- 2D diffusion-reaction loaders (primary/aux/downsample/merge)
  ns       -- 2D incompressible NS loaders (primary/aux file pairing)
  ns3d     -- 3D plume (ScalarFlow-style) loaders
  stream   -- host-streaming window loader for stores that exceed HBM
  generic  -- generic HDF5 folder dataset (reference pytorch_dataset.py)
"""

from sciml_pde_tpu.data.windows import (  # noqa: F401
    WindowedTrajectories,
    epoch_batches,
    gather_windows,
)
