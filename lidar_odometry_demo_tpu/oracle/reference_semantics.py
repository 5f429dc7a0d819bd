"""NumPy oracle implementing the reference's semantics the direct way.

A deliberately straightforward, dict-and-loop re-statement of what the
reference does (see file:line citations on each function), used as the test
oracle for the static-shape TPU implementations. This is NOT the product
code path — it exists so every TPU op has an independent, readable
behavioral specification to be compared against (the strategy mirrors the
reference's own oracle-based tests, test/test.cpp:77-189, which check
against Eigen/PCL).
"""

from __future__ import annotations

import numpy as np


def voxel_index(p: np.ndarray, voxel_size: float) -> tuple:
    """Truncation-toward-zero quantization (reference voxel_grid.h:68-75)."""
    return tuple(np.trunc(np.asarray(p, np.float64) / voxel_size).astype(np.int64))


class DictVoxelGrid:
    """Reference VoxelGrid semantics with a python dict (voxel_grid.h:17-257)."""

    def __init__(self, voxel_size: float, max_points: int):
        self.voxel_size = voxel_size
        self.max_points = max_points
        self.voxels: dict[tuple, list] = {}

    def add_cloud(self, pts: np.ndarray, normals: np.ndarray | None = None):
        """addCloud (voxel_grid.h:77-93): first-come-kept, overflow dropped."""
        if normals is None:
            normals = np.zeros_like(pts)
        for p, n in zip(pts, normals):
            idx = voxel_index(p, self.voxel_size)
            bucket = self.voxels.setdefault(idx, [])
            if len(bucket) < self.max_points:
                bucket.append((np.asarray(p, np.float32), np.asarray(n, np.float32)))

    def get_cloud(self) -> tuple[np.ndarray, np.ndarray]:
        pts, nrm = [], []
        for bucket in self.voxels.values():
            for p, n in bucket:
                pts.append(p)
                nrm.append(n)
        if not pts:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        return np.stack(pts), np.stack(nrm)

    def radius_cleanup(self, center: np.ndarray, radius: float):
        """radiusCleanup (voxel_grid.h:236-246): anchor = first stored point."""
        r2 = radius * radius
        dead = [
            k for k, bucket in self.voxels.items()
            if np.sum((bucket[0][0] - center) ** 2) > r2
        ]
        for k in dead:
            del self.voxels[k]

    def get_correspondence(self, query: np.ndarray, max_d2: float):
        """getCorrespondence (voxel_grid.h:164-204)."""
        ox, oy, oz = voxel_index(query, self.voxel_size)
        best = None
        best_d2 = np.inf
        for ix in (ox - 1, ox, ox + 1):
            for iy in (oy - 1, oy, oy + 1):
                for iz in (oz - 1, oz, oz + 1):
                    for p, n in self.voxels.get((ix, iy, iz), []):
                        d2 = float(np.sum((query - p) ** 2))
                        if d2 < max_d2 and d2 < best_d2:
                            best = (p, n)
                            best_d2 = d2
        return best  # None if no match

    def size(self) -> int:
        return len(self.voxels)


def classify_oracle(xyz: np.ndarray, ring: np.ndarray, num_rings: int, width: int,
                    curvature_window: int = 4, normals_window: int = 4,
                    flatness_threshold: float = 0.05,
                    min_valid_range_sq: float = 0.1,
                    curvature_invalid_value: float = 1000.0,
                    neighbor_flatness_factor: float = 10.0):
    """CloudClassifier::classify with a *static* image width
    (reference cloud_classifier.h:17-168; the reference's width is the
    dynamic per-scan max ring occupancy — tests feed data where both agree).

    Returns (planar_mask (R, W), normals (R, W, 3), organized_xyz, curv).
    """
    R, W = num_rings, width
    img = np.zeros((R, W, 3), np.float32)
    occupied = np.zeros((R, W), bool)
    for i in range(xyz.shape[0]):
        r = int(ring[i])
        if not (0 <= r < R):
            continue
        azimuth = np.arctan2(-xyz[i, 1], xyz[i, 0]) + np.pi
        col = int(abs(azimuth * W / (2.0 * np.pi)))
        if col < W:
            img[r, col] = xyz[i]  # last write wins (cloud_classifier.h:53)
            occupied[r, col] = True

    flat = img.reshape(R * W, 3)
    k = curvature_window
    curv = np.full(R * W, curvature_invalid_value, np.float32)
    for i in range(k, R * W - k):
        rng2 = float(np.sum(flat[i] ** 2))
        if rng2 < min_valid_range_sq:
            curv[i] = curvature_invalid_value
            continue
        d = -flat[i] * (2.0 * k + 1.0) + np.sum(flat[i - k:i + k + 1], axis=0)
        curv[i] = np.sqrt(np.sum(d * d)) / rng2
    curv = curv.reshape(R, W)

    kn = normals_window
    planar = np.zeros((R, W), bool)
    normals = np.zeros((R, W, 3), np.float32)
    for ray in range(1, R):
        for col in range(kn, W - kn):
            if curv[ray, col] >= flatness_threshold:
                continue
            prev = ray - 1
            left = None
            for c in range(col - kn, col):
                if curv[prev, c] < flatness_threshold * neighbor_flatness_factor:
                    left = img[prev, c]
                    break
            right = None
            for c in range(col + kn, col, -1):
                if curv[prev, c] < flatness_threshold * neighbor_flatness_factor:
                    right = img[prev, c]
                    break
            if left is None or right is None:
                continue
            origin = img[ray, col]
            n = np.cross(left - origin, right - origin)
            norm = np.linalg.norm(n)
            if norm == 0:
                continue
            planar[ray, col] = True
            normals[ray, col] = n / norm
    return planar, normals, img, curv


def deskew_oracle(xyz: np.ndarray, t: np.ndarray, start_t, start_q, end_t, end_q,
                  forward_translation: bool = False):
    """transformNonRigid (reference cloud_transform.h:16-40) via scipy.

    start_q/end_q are wxyz. Rotation slerps start->end with t. By default
    translation interpolates start*t + end*(1-t) — the reference's
    backwards quirk; forward_translation=True gives the corrected
    start*(1-t) + end*t (the engine's default, see config.py).
    """
    from scipy.spatial.transform import Rotation, Slerp

    rs = Rotation.from_quat([
        [start_q[1], start_q[2], start_q[3], start_q[0]],
        [end_q[1], end_q[2], end_q[3], end_q[0]],
    ])
    sl = Slerp([0.0, 1.0], rs)
    tt = np.clip(t, 0.0, 1.0)
    rot = sl(tt)
    out = rot.apply(xyz)
    ws = (1.0 - tt) if forward_translation else tt
    out = out + ws[:, None] * np.asarray(start_t)[None, :] \
              + (1.0 - ws)[:, None] * np.asarray(end_t)[None, :]
    return out.astype(np.float32)
