"""Static-shape point-cloud containers.

The reference passes dynamically-sized PCL clouds between stages
(pcl::PointCloud<PointXYZIRT>, reference src/lidar_point_type.h:13-31). The
TPU-native equivalent is a fixed-capacity struct-of-arrays with a validity
mask: filtering never erases, it only clears mask bits, so every stage is a
jit-stable static shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LidarScan(NamedTuple):
    """Padded VLP16 scan: XYZ + intensity + ring + per-point time + mask.

    Mirrors lidar_point::PointXYZIRT (reference src/lidar_point_type.h:13-20)
    as struct-of-arrays.
    """

    xyz: jax.Array        # (N, 3) float32
    intensity: jax.Array  # (N,) float32
    ring: jax.Array       # (N,) int32
    time: jax.Array       # (N,) float32
    valid: jax.Array      # (N,) bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


class PointsWithNormals(NamedTuple):
    """Planar feature cloud: points + unit plane normals + mask.

    Mirrors pcl::PointNormal clouds flowing through the reference pipeline
    (classifier output, keyframe update; reference src/lidar_odometry.cpp:33-70).
    """

    xyz: jax.Array     # (N, 3) float32
    normal: jax.Array  # (N, 3) float32
    valid: jax.Array   # (N,) bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def scan_from_numpy(
    xyz: np.ndarray,
    intensity: np.ndarray,
    ring: np.ndarray,
    time: np.ndarray,
    capacity: int,
) -> LidarScan:
    """Pad a host-side scan up to `capacity` points."""
    n = xyz.shape[0]
    if n > capacity:
        raise ValueError(f"scan has {n} points > capacity {capacity}")
    pad = capacity - n
    f32 = np.float32
    return LidarScan(
        xyz=jnp.asarray(np.concatenate([xyz.astype(f32), np.zeros((pad, 3), f32)])),
        intensity=jnp.asarray(np.concatenate([intensity.astype(f32), np.zeros(pad, f32)])),
        ring=jnp.asarray(np.concatenate([ring.astype(np.int32), np.zeros(pad, np.int32)])),
        time=jnp.asarray(np.concatenate([time.astype(f32), np.zeros(pad, f32)])),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])),
    )


def compact_points(pts: PointsWithNormals, budget: int) -> PointsWithNormals:
    """Compact valid points to the front, truncating/padding to `budget`.

    Deterministic: stable partition preserves input order among valid points.
    """
    n = pts.capacity
    order = jnp.argsort(jnp.where(pts.valid, 0, 1), stable=True)
    take = order[:budget]
    in_range = jnp.arange(budget) < jnp.sum(pts.valid.astype(jnp.int32))
    return PointsWithNormals(
        xyz=jnp.where(in_range[:, None], pts.xyz[take], 0.0),
        normal=jnp.where(in_range[:, None], pts.normal[take], 0.0),
        valid=in_range & pts.valid[take],
    )
