"""sciml_pde_tpu: TPU-native framework for neural PDE operators.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``mehrdadmmz/SciML-PDE`` (PDEBench fork with multiphysics joint training):

- FNO2d / FNO3d neural operators with two-head auxiliary ("basic physics form")
  joint training (reference: ``pdebench/models/fno*``).
- VideoMAE-style spatio-temporal Transformer operators in 2D and 3D
  (reference: ``pdebench/models/Transformer_*``).
- JAX-native PDE data generation: 2D FitzHugh-Nagumo diffusion-reaction,
  2D incompressible Navier-Stokes, 3D buoyant plume
  (reference: ``pdebench/data_gen``).
- Rollout evaluation with the six PDEBench metrics
  (reference: ``pdebench/models/metrics.py``).

Everything compiles to single jitted programs over a ``jax.sharding.Mesh``;
data parallelism is batch sharding over ICI (the reference used
``nn.DataParallel``/NCCL).
"""

__version__ = "0.1.0"
