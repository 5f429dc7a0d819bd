"""Registration on the reference's real scan fixture.

Mirrors the reference's own accuracy regression test CloudMatcher.MatchingTest
(reference test/test.cpp:191-263 — BASELINE config 1): load a real PCD scan,
estimate normals geometrically (the reference uses PCL NormalEstimation with
radius 0.25, bypassing the classifier), build a keyframe map (0.25 m voxels,
20 pts) and a 0.5 m matching downsample of the same cloud, then recover
perturbations up to 0.2 m / 2 deg from an identity initial guess to within
the reference's own bounds: translation error < 0.05 m, rotation error
(1 - |q . q_hat|) < 0.01.

The reference's fixture scan_005_subsampled_crop.pcd is absent from this
mount (.MISSING_LARGE_BLOBS); intersection00056.pcd (59,691-point BlenSor
intersection scan) is present and serves the same role.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io import pcd
from lidar_odometry_demo_tpu.ops import icp, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

FIXTURE = "/root/reference/test/test_data/intersection00056.pcd"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not mounted")


def _estimate_normals(xyz: np.ndarray, radius: float = 0.25):
    """PCA plane normal per point over a radius neighborhood — the same
    estimator as the reference test's pcl::NormalEstimation (test.cpp:196-224),
    implemented with scipy for independence."""
    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    neighbors = tree.query_ball_point(xyz, r=radius, workers=-1)
    normals = np.zeros_like(xyz)
    ok = np.zeros(xyz.shape[0], bool)
    for i, idx in enumerate(neighbors):
        if len(idx) < 5:
            continue
        pts = xyz[idx]
        cov = np.cov((pts - pts.mean(0)).T)
        w, v = np.linalg.eigh(cov)
        normals[i] = v[:, 0]
        ok[i] = True
    return normals.astype(np.float32), ok


@pytest.fixture(scope="module")
def scan():
    data = pcd.read_pcd(FIXTURE)
    xyz = np.stack([data["x"], data["y"], data["z"]], -1).astype(np.float32)
    xyz = xyz[np.isfinite(xyz).all(-1)]
    # the BlenSor export is y-up (y in [0.3, 9.6], x/z spanning +-100 m+);
    # the pipeline's key packing budgets 9 bits for the VERTICAL axis
    # (+-32 m at 0.25 m voxels) — re-express z-up and crop to the central
    # 60 m where the scan is dense (the reference's own fixture for this
    # test was a *crop* too: scan_005_subsampled_crop.pcd)
    xyz = xyz[:, [0, 2, 1]]
    xyz = xyz[np.linalg.norm(xyz[:, :2], axis=1) < 35.0]
    nrm, ok = _estimate_normals(xyz, radius=0.5)
    return xyz[ok], nrm[ok]


def test_real_scan_registration(scan):
    xyz, nrm = scan
    cfg = OdometryConfig(
        keyframe_voxel_size=0.25,       # test.cpp:226 VoxelGrid(0.25, 20)
        keyframe_matching_voxel_size=0.5,  # test.cpp:229 VoxelGrid(0.5, 1)
        max_match_points=8192,
        # literal reference search semantics: re-search every outer
        # iteration (the cached-candidate fast path assumes the guess is
        # within a fraction of a voxel — true for odometry's constant-
        # velocity guesses, not for this test's 0.2 m cold perturbations)
        icp_cached_candidates=False,
    )

    keyframe = vm.map_init(32768, 20)
    pts = PointsWithNormals(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        valid=jnp.ones(xyz.shape[0], bool))
    keyframe = vm.map_insert(keyframe, pts, voxel_size=cfg.keyframe_voxel_size)

    match = vm.downsample(pts, voxel_size=cfg.keyframe_matching_voxel_size,
                          budget=cfg.max_match_points)

    # the reference's EXACT 7 guess poses (test.cpp:235-243): translations
    # up to 0.2 m, yaw-only rotations up to 2 deg
    deg = np.pi / 180.0
    cases = [
        ((0.0, 0.0, 0.0), 0.0),
        ((0.0, 0.0, 0.1), 0.0),
        ((0.1, 0.1, 0.1), 0.0),
        ((-0.1, -0.1, -0.1), 0.0),
        ((0.1, -0.1, 0.0), 0.0),
        ((0.0, 0.0, 0.0), -1.0 * deg),
        ((-0.2, 0.0, 0.0), 2.0 * deg),
    ]

    for t, yaw in cases:
        true_pose = se3.Pose(
            jnp.asarray(t, jnp.float32),
            se3.quat_exp(jnp.asarray([0.0, 0.0, yaw], jnp.float32)))
        # transform the query cloud by the INVERSE perturbation; aligning it
        # back to the map from an identity guess must recover `true_pose`
        # (test.cpp:249-251)
        inv = se3.inverse(true_pose)
        Rm = np.asarray(se3.quat_to_matrix(inv.q))
        q_xyz = np.asarray(match.xyz) @ Rm.T + np.asarray(inv.t)
        res = icp.align(
            keyframe, jnp.asarray(q_xyz), match.valid,
            se3.Pose.identity(), cfg)
        err = se3.relative_to(res.pose, true_pose)
        t_err = float(jnp.linalg.norm(err.t))
        q_dot = abs(float(jnp.sum(res.pose.q * true_pose.q)))
        assert t_err < 0.05, (t, yaw, t_err)     # test.cpp:261
        assert 1.0 - q_dot < 0.01, (t, yaw, q_dot)  # test.cpp:262
        assert int(res.num_matches) > 500
