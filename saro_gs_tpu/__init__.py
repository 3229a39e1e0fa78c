"""saro_gs_tpu — a TPU-native 4D Gaussian splatting framework (JAX/XLA/Pallas).

Re-designed from scratch with the capabilities of SaRO-GS (ACM MM 2024):
  * tile-based differentiable Gaussian rasterizer with analytic backward
    (Pallas kernels on TPU, a pure-JAX reference path everywhere),
  * scale-aware residual field (mip-sampled HexPlane 4D grids + MLP heads),
  * adaptive optimization (per-Gaussian integral-scaled learning rates),
  * capacity-padded densification / pruning that stays jit-stable,
  * SPMD scaling over `jax.sharding.Mesh` (data- and tile-parallel).

Layer map (mirrors SURVEY.md §1 of the reference analysis):
  ops/       L0 rasterization + field sampling kernels
  models/    L1 Gaussian model + scale-aware residual field
  render.py  L2 renderer glue
  data/      L3 scene/data readers
  train/     L4 training drivers, losses, optimizer
  config.py  L5 config/flag system
  parallel/  device-mesh sharding (new; reference is single-GPU)
"""

__version__ = "0.1.0"
