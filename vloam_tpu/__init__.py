"""vloam_tpu — a TPU-native visual-lidar odometry and mapping engine.

A from-scratch JAX/XLA/Pallas re-design of the VLOAM pipeline (reference:
liuzm-slam/VLOAM-NOTED, a ROS1/C++/Ceres/PCL stack).  Nothing here is a
translation: callbacks become pure scan-step functions over pytree state,
Ceres autodiff + DENSE_QR becomes batched Gauss-Newton with analytic
Jacobians, kd-trees become MXU matmul nearest-neighbour searches, and the
rolling voxel-cube map becomes a fixed-shape block-cyclic cube grid that
shards across a device mesh.

Layer map (mirrors SURVEY.md §1 of the reference):
  L5 driver      : vloam_tpu.runtime (CLI / frame loop / export)
  L4a VO         : vloam_tpu.models.visual_odometry
  L4b LO + MO    : vloam_tpu.models.lidar_odometry, .laser_mapping
  L3 frame graph : vloam_tpu.models.frame_graph (the vloam_tf equivalent)
  L2 solvers     : vloam_tpu.ops.{lidar_factors, vo_factors, gauss_newton}
  L1 substrate   : JAX/XLA/Pallas + vloam_tpu.ops.{knn, voxel, image_ops, ...}
"""

__version__ = "0.1.0"

import jax as _jax

# This is a metric-scale geometry engine, not a neural net: matmuls carry
# pixel coordinates (~1e3), world-frame points (km after long drives), and
# Gauss-Newton normal equations.  The TPU default bf16 MXU pass loses
# ~|value|^2 * 2^-8 per product — measured 67 m^2 error / 0.81 recall@5 in
# the correspondence distances at +-60 m coords (ops/knn.py docstring).
# f32 ("highest", 6-pass bf16 decomposition) is the only safe default;
# tolerant hot spots (descriptor matching, image stencils) may opt down
# explicitly via precision= at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

from vloam_tpu.config import VloamConfig  # noqa: F401
