"""PCD IO: round-trip + the reference's bundled binary fixture."""

import os

import numpy as np
import pytest

from lidar_odometry_demo_tpu.io import pcd

REF_FIXTURE = "/root/reference/test/test_data/intersection00056.pcd"


def test_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "t.pcd")
    pcd.write_pcd(path, xyz, nrm)
    d = pcd.read_pcd(path)
    np.testing.assert_allclose(d["x"], xyz[:, 0], atol=1e-5)
    np.testing.assert_allclose(d["normal_z"], nrm[:, 2], atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="fixture not mounted")
def test_reads_reference_fixture():
    # 59,691-point binary scan with pad fields (FIELDS rgb _ x y z _)
    xyz = pcd.read_pcd_xyz(REF_FIXTURE)
    assert xyz.shape[0] > 50000
    assert np.isfinite(xyz).all()
    extent = xyz.max(0) - xyz.min(0)
    assert extent.max() > 10.0  # real scan scale, not garbage


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="fixture not mounted")
def test_icp_on_reference_fixture():
    """Scan-to-self ICP on the real fixture (BASELINE config 1 flavor):
    estimate normals crudely, perturb, recover."""
    import jax.numpy as jnp

    from lidar_odometry_demo_tpu.config import OdometryConfig
    from lidar_odometry_demo_tpu.ops import icp, se3
    from lidar_odometry_demo_tpu.ops import voxel_map as vm
    from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

    xyz = pcd.read_pcd_xyz(REF_FIXTURE)
    # crude normals via local PCA over a voxel-hash neighborhood (host-side;
    # the reference test uses PCL NormalEstimation radius=0.25, test.cpp:203)
    from scipy.spatial import cKDTree

    sel = np.random.default_rng(0).choice(xyz.shape[0], 20000, replace=False)
    pts = xyz[sel]
    tree = cKDTree(xyz)  # neighborhoods from the full-resolution cloud
    dists, idx = tree.query(pts, k=16)
    nbrs = xyz[idx]  # (N, 16, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered)
    w, v = np.linalg.eigh(cov)
    normals = v[:, :, 0]
    ok = dists[:, -1] < 0.6
    pts, normals = pts[ok], normals[ok]

    n = pts.shape[0]
    cap = 1 << (n - 1).bit_length()
    pn = PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([pts, np.zeros((cap - n, 3), np.float32)])),
        normal=jnp.asarray(np.concatenate([normals.astype(np.float32), np.zeros((cap - n, 3), np.float32)])),
        valid=jnp.asarray(np.arange(cap) < n),
    )
    m = vm.map_init(1 << 16, 20)
    m = vm.map_insert(m, pn, voxel_size=0.25)
    sub = vm.downsample(pn, voxel_size=0.5, budget=4096)
    cfg = OdometryConfig(keyframe_voxel_size=0.25)

    guess = se3.Pose(
        jnp.asarray([0.1, -0.1, 0.05], jnp.float32),
        se3.quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), np.deg2rad(1.0)),
    )
    moved = se3.transform_points(se3.inverse(guess), sub.xyz)
    res = icp.align(m, moved, sub.valid, se3.Pose.identity(), cfg)
    err = se3.relative_to(res.pose, guess)
    assert float(jnp.linalg.norm(err.t)) < 0.05
    assert 1.0 - abs(float(jnp.sum(res.pose.q * guess.q))) < 0.01
