"""TPU-native LiDAR odometry engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
vovo-4K/lidar_odometry_demo (KISS-ICP-style LiDAR-only odometry for VLP16):
continuous-time deskew -> LOAM-style planar feature extraction -> voxel-grid
downsampling -> point-to-plane ICP against a hash-voxel keyframe map ->
keyframe update with radius eviction.

Everything is static-shape, jit-compiled, and mesh-shardable. The reference's
dynamic PCL clouds / robin_map / Ceres stack (see /root/reference/src) is
replaced by padded masked arrays, a sorted-key voxel table, and a hand-rolled
Gauss-Newton solver on SE(3).
"""

__version__ = "0.1.0"

from lidar_odometry_demo_tpu.config import OdometryConfig

__all__ = ["OdometryConfig"]
