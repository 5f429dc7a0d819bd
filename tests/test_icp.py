"""ICP convergence regression — the reference MatchingTest analog.

Mirrors reference test/test.cpp:191-263: build a keyframe map (voxel 0.25,
cap 20) from a structured cloud with normals, downsample the same cloud
(0.5, 1 pt/voxel), perturb it by each of 7 guesses (up to 0.2 m / 2 deg),
align from an identity initial guess, and require translation error
< 0.05 m and quaternion-dot rotation error < 0.01 — the reference's own CI
bounds (test.cpp:261-262). The reference fixture PCD is missing from the
mount, so the cloud is a synthetic room with analytic normals.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import sample_structured_cloud
from lidar_odometry_demo_tpu.ops import icp, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals


def _pose(t, axis=(0, 0, 1), angle=0.0):
    ax = np.asarray(axis, np.float64)
    ax = ax / np.linalg.norm(ax)
    return se3.Pose(
        jnp.asarray(t, jnp.float32),
        se3.quat_from_axis_angle(jnp.asarray(ax, jnp.float32), float(angle)),
    )


GUESSES = [
    _pose((0.0, 0.0, 0.0)),
    _pose((0.0, 0.0, 0.1)),
    _pose((0.1, 0.1, 0.1)),
    _pose((-0.1, -0.1, -0.1)),
    _pose((0.1, -0.1, 0.0)),
    _pose((0.0, 0.0, 0.0), angle=np.deg2rad(-1.0)),
    _pose((-0.2, 0.0, 0.0), angle=np.deg2rad(2.0)),
]


@pytest.fixture(scope="module")
def matching_setup():
    cloud, normals = sample_structured_cloud(seed=3)
    n = cloud.shape[0]
    cap = 1 << (n - 1).bit_length()
    pn = PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([cloud, np.zeros((cap - n, 3), np.float32)])),
        normal=jnp.asarray(np.concatenate([normals, np.zeros((cap - n, 3), np.float32)])),
        valid=jnp.asarray(np.arange(cap) < n),
    )
    # keyframe VoxelGrid(0.25, 20) (test.cpp:226-227)
    m = vm.map_init(1 << 16, 20)
    m = vm.map_insert(m, pn, voxel_size=0.25)
    # matching cloud: VoxelGrid(0.5, 1) downsample (test.cpp:229-231)
    sub = vm.downsample(pn, voxel_size=0.5, budget=4096)
    cfg = OdometryConfig(keyframe_voxel_size=0.25)
    return m, sub, cfg


@pytest.mark.parametrize("gi", range(len(GUESSES)))
def test_matching_recovers_perturbation(matching_setup, gi):
    m, sub, cfg = matching_setup
    guess = GUESSES[gi]
    # transform cloud by guess^-1; aligning from identity must recover guess
    inv = se3.inverse(guess)
    moved = se3.transform_points(inv, sub.xyz)
    res = icp.align(m, moved, sub.valid, se3.Pose.identity(), cfg)

    err = se3.relative_to(res.pose, guess)
    t_err = float(jnp.linalg.norm(err.t))
    rot_err = 1.0 - abs(float(jnp.sum(res.pose.q * guess.q)))
    assert t_err < 0.05, (gi, t_err, rot_err, int(res.iterations), float(res.step_norm))
    assert rot_err < 0.01, (gi, t_err, rot_err)


def test_align_converges_early(matching_setup):
    m, sub, cfg = matching_setup
    res = icp.align(m, sub.xyz, sub.valid, se3.Pose.identity(), cfg)
    # identity-to-identity: should converge at the minimum outer count
    assert int(res.iterations) <= cfg.icp_min_outer_iterations + 2
    assert float(res.step_norm) < cfg.icp_convergence_step_norm
    assert int(res.num_matches) > 100


def test_no_matches_returns_guess():
    cfg = OdometryConfig()
    m = vm.map_init(256, 4)  # empty map
    q = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (64, 3)), jnp.float32)
    guess = _pose((1.0, 2.0, 3.0), angle=0.3)
    res = icp.align(m, q, jnp.ones(64, bool), guess, cfg)
    # with zero correspondences only the translation prior acts: pose must
    # stay at the guess (prior is centered there) and not blow up
    np.testing.assert_allclose(np.asarray(res.pose.t), np.asarray(guess.t), atol=1e-4)
    assert abs(float(jnp.sum(res.pose.q * guess.q))) > 1.0 - 1e-5
