"""Preprocessing ops vs NumPy/scipy oracles."""

import numpy as np
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops import preprocess, se3
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.oracle.reference_semantics import deskew_oracle


def _scan(rng, n=100, cap=128):
    xyz = rng.uniform(-10, 10, (n, 3))
    return scan_from_numpy(
        xyz,
        rng.uniform(0, 100, n),
        rng.integers(0, 16, n),
        rng.uniform(0.3, 0.4, n),
        cap,
    )


def test_time_normalize(rng):
    scan = _scan(rng)
    out = preprocess.time_normalize(scan)
    t = np.asarray(out.time)[np.asarray(scan.valid)]
    raw = np.asarray(scan.time)[np.asarray(scan.valid)]
    assert abs(t.min()) < 1e-6 and abs(t.max() - 1.0) < 1e-6
    # linearity: order preserved
    assert np.all(np.argsort(t) == np.argsort(raw))
    # padded entries excluded from min/max: re-run with a poisoned pad value
    poisoned = scan._replace(time=jnp.where(scan.valid, scan.time, 1e6))
    out2 = preprocess.time_normalize(poisoned)
    t2 = np.asarray(out2.time)[np.asarray(scan.valid)]
    np.testing.assert_allclose(t2, t, atol=1e-5)


def test_range_filter(rng):
    scan = _scan(rng)
    mask = preprocess.range_filter_mask(scan.xyz, scan.valid, 4.0, 12.0)
    r = np.linalg.norm(np.asarray(scan.xyz), axis=-1)
    expect = np.asarray(scan.valid) & (r >= 4.0 - 1e-6) & (r <= 12.0 + 1e-6)
    np.testing.assert_array_equal(np.asarray(mask), expect)


def test_deskew_matches_oracle(rng):
    scan = _scan(rng)
    scan = preprocess.time_normalize(scan)
    start = se3.Pose(
        jnp.asarray([0.2, -0.1, 0.05], jnp.float32),
        se3.quat_from_axis_angle(jnp.asarray([0.0, 0, 1.0], jnp.float32), 0.1),
    )
    end = se3.Pose(
        jnp.asarray([0.0, 0.0, 0.0], jnp.float32),
        se3.quat_from_axis_angle(jnp.asarray([0.3, 0.4, 0.866], jnp.float32), -0.05),
    )
    v = np.asarray(scan.valid)
    # both translation-interpolation modes must match the oracle
    for forward in (True, False):
        out = preprocess.deskew(scan, start, end, forward_translation=forward)
        expect = deskew_oracle(
            np.asarray(scan.xyz)[v], np.asarray(scan.time)[v],
            np.asarray(start.t), np.asarray(start.q),
            np.asarray(end.t), np.asarray(end.q),
            forward_translation=forward,
        )
        np.testing.assert_allclose(np.asarray(out.xyz)[v], expect, atol=1e-4)


def test_deskew_identity_poses_is_noop(rng):
    scan = preprocess.time_normalize(_scan(rng))
    out = preprocess.deskew(scan, se3.Pose.identity(), se3.Pose.identity())
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(scan.xyz), atol=1e-5)


def test_transform_with_normals(rng):
    from scipy.spatial.transform import Rotation
    from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    nrm = rng.normal(size=(50, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    pts = PointsWithNormals(jnp.asarray(xyz), jnp.asarray(nrm), jnp.ones(50, bool))
    pose = se3.Pose(
        jnp.asarray([1.0, 2.0, -0.5], jnp.float32),
        se3.quat_from_axis_angle(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), 0.7),
    )
    out = preprocess.transform_with_normals(pts, pose)
    r = Rotation.from_rotvec(0.7 * np.array([0, 1.0, 0]))
    np.testing.assert_allclose(np.asarray(out.xyz), r.apply(xyz) + [1, 2, -0.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.normal), r.apply(nrm), atol=1e-5)
