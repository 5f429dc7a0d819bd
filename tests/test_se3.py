"""SE(3) core vs scipy.spatial oracle.

Mirrors the reference's Pose3D.ComposeRelativeInverse strategy
(reference test/test.cpp:77-149: Eigen Isometry3f as the oracle over 7 pose
pairs) using scipy Rotation as the oracle, plus slerp/exp/log/euler coverage
the reference lacks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation, Slerp

from lidar_odometry_demo_tpu.ops import se3


def _pose(t, rotvec):
    q = Rotation.from_rotvec(rotvec).as_quat()  # xyzw
    return se3.Pose(
        jnp.asarray(t, jnp.float32),
        jnp.asarray([q[3], q[0], q[1], q[2]], jnp.float32),
    )


def _as_scipy(p: se3.Pose) -> tuple[np.ndarray, Rotation]:
    q = np.asarray(p.q)
    return np.asarray(p.t), Rotation.from_quat([q[1], q[2], q[3], q[0]])


# the reference's 7 test pose pairs (test/test.cpp:79-108), expressed as
# (translation, rotvec) pairs
POSE_PAIRS = [
    (((0, 0, 0), (0, 0, 0)), ((0, 0, 0), (0, 0, 0))),
    (((0, 0, 0), (0, 0, 0.2)), ((0, 0, 0), (0, 0, 0.2))),
    (((0, 0, 0), (0, 0, 0)), ((1, 0, 0), (0, 0, np.pi * 0.5))),
    (((1, 0, 0), (0, 0, 0)), ((1, 1, 1), (0, 0, -np.pi))),
    (((100, 100, 100), (0, 0, 0)), ((150, 150, 150), (0, 0, 0))),
    (((100, 100, 100), (0, 0, 0.1)), ((150, 150, 150), (0, 0, -0.2))),
    (
        ((1, 0.5, -0.5), tuple(0.456 * np.array([0.1, 0.2, 1]) / np.linalg.norm([0.1, 0.2, 1]))),
        ((-1, -0.6, 0), (-0.245, 0, 0)),
    ),
]


def _quat_agree(q_ours, rot: Rotation, tol=1e-5):
    qs = rot.as_quat()  # xyzw
    q_oracle = np.array([qs[3], qs[0], qs[1], qs[2]])
    assert abs(abs(np.dot(np.asarray(q_ours), q_oracle)) - 1.0) < tol


@pytest.mark.parametrize("pair", POSE_PAIRS)
def test_compose_relative_inverse(pair):
    p1, p2 = _pose(*pair[0]), _pose(*pair[1])
    t1, r1 = _as_scipy(p1)
    t2, r2 = _as_scipy(p2)

    comp = se3.compose(p1, p2)
    np.testing.assert_allclose(np.asarray(comp.t), r1.apply(t2) + t1, atol=1e-4)
    _quat_agree(comp.q, r1 * r2)

    rel = se3.relative_to(p1, p2)
    np.testing.assert_allclose(np.asarray(rel.t), r1.inv().apply(t2 - t1), atol=1e-4)
    _quat_agree(rel.q, r1.inv() * r2)

    inv = se3.inverse(p1)
    np.testing.assert_allclose(np.asarray(inv.t), -r1.inv().apply(t1), atol=1e-4)
    _quat_agree(inv.q, r1.inv())


def test_quat_rotate_matches_matrix(rng):
    q = se3.quat_normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    out = se3.quat_rotate(q, v)
    out_m = jnp.einsum("nij,nj->ni", se3.quat_to_matrix(q), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_m), atol=1e-5)


def test_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, (64, 1))
    w = jnp.asarray(w, jnp.float32)  # |w| < pi so log(exp(w)) == w
    q = se3.quat_exp(w)
    # matches scipy: quat_exp(w) rotates by |w| about w
    r = Rotation.from_rotvec(np.asarray(w))
    qs = r.as_quat()
    q_oracle = np.stack([qs[:, 3], qs[:, 0], qs[:, 1], qs[:, 2]], -1)
    dots = np.abs(np.sum(np.asarray(q) * q_oracle, -1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
    w_back = se3.quat_log(q)
    np.testing.assert_allclose(np.asarray(w_back), np.asarray(w), atol=1e-4)


def test_exp_small_angle():
    w = jnp.asarray([[0.0, 0.0, 0.0], [1e-8, 0, 0], [0, -1e-7, 0]], jnp.float32)
    q = se3.quat_exp(w)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(se3.quat_log(q)), np.asarray(w), atol=1e-9)


def test_slerp_vs_scipy(rng):
    for _ in range(5):
        r = Rotation.from_rotvec(rng.normal(size=(2, 3)))
        qs = r.as_quat()
        q = jnp.asarray(np.stack([qs[:, 3], qs[:, 0], qs[:, 1], qs[:, 2]], -1), jnp.float32)
        ts = np.linspace(0, 1, 11)
        sl = Slerp([0, 1], r)
        ours = se3.quat_slerp(
            jnp.broadcast_to(q[0], (11, 4)), jnp.broadcast_to(q[1], (11, 4)), jnp.asarray(ts, jnp.float32)
        )
        oracle = sl(ts).as_quat()
        oracle = np.stack([oracle[:, 3], oracle[:, 0], oracle[:, 1], oracle[:, 2]], -1)
        dots = np.abs(np.sum(np.asarray(ours) * oracle, -1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_slerp_identical_endpoints():
    q = se3.quat_normalize(jnp.asarray([[0.9, 0.1, 0.2, 0.3]], jnp.float32))
    out = se3.quat_slerp(q, q, jnp.asarray([0.37], jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-6)


def test_euler_angles_match_eigen_convention(rng):
    # Oracle: res = eulerAngles(0,1,2) must reconstruct R = Rx Ry Rz and have
    # res[0] in [0, pi] (Eigen's documented range for the first angle).
    for _ in range(20):
        r = Rotation.from_rotvec(rng.normal(size=3))
        R = jnp.asarray(r.as_matrix(), jnp.float32)
        ang = np.asarray(se3.euler_angles_xyz(R))
        assert -1e-6 <= ang[0] <= np.pi + 1e-6
        recon = Rotation.from_euler("XYZ", ang).as_matrix()
        np.testing.assert_allclose(recon, np.asarray(R), atol=1e-5)


def test_divergence_guard_predicate():
    cfg_thr = 5.0
    # small rotation: accepted
    q_small = se3.quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), np.deg2rad(2.0))
    assert bool(se3.rotation_within_threshold(q_small, cfg_thr))
    # 10-degree rotation: rejected
    q_big = se3.quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), np.deg2rad(10.0))
    assert not bool(se3.rotation_within_threshold(q_big, cfg_thr))
    # identity: accepted
    assert bool(se3.rotation_within_threshold(jnp.asarray([1.0, 0, 0, 0], jnp.float32), cfg_thr))
    # rotation about an arbitrary axis, 1 deg: accepted
    ax = jnp.asarray(np.array([1.0, 2.0, 3.0]) / np.sqrt(14.0), jnp.float32)
    assert bool(se3.rotation_within_threshold(se3.quat_from_axis_angle(ax, np.deg2rad(1.0)), cfg_thr))
    assert not bool(se3.rotation_within_threshold(se3.quat_from_axis_angle(ax, np.deg2rad(9.0)), cfg_thr))


def test_transform_points_batch(rng):
    p = _pose((1.0, -2.0, 0.5), (0.3, -0.1, 0.2))
    pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    out = se3.transform_points(p, pts)
    t, r = _as_scipy(p)
    np.testing.assert_allclose(np.asarray(out), r.apply(np.asarray(pts)) + t, atol=1e-5)


def test_jit_and_vmap():
    p = se3.Pose.identity((8,))
    out = jax.jit(jax.vmap(se3.inverse))(p)
    assert out.t.shape == (8, 3) and out.q.shape == (8, 4)
