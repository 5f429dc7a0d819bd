"""Multi-device sharding tests on the 8-device CPU fabric.

Validates that the dp/sp sharded programs produce the same trajectories as
the single-device path — the determinism bar the reference cannot offer
(its parallel-for + mutex correspondence collection is order-nondeterministic,
voxel_grid.h:206-234; SURVEY.md §5 race detection).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import PartitionSpec as P

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import sample_structured_cloud, simulate_sequence
from lidar_odometry_demo_tpu.ops import icp, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals, scan_from_numpy
from lidar_odometry_demo_tpu.parallel import batched, mesh as mesh_lib
from lidar_odometry_demo_tpu.pipeline import odometry

CFG = OdometryConfig(
    scan_width=900,
    max_raw_points=16384,
    max_planar_points=8192,
    max_match_points=2048,
    max_update_points=8192,
    map_capacity=32768,
)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


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
    m = vm.map_init(1 << 15, 20)
    m = vm.map_insert(m, pn, voxel_size=0.25)
    sub = vm.downsample(pn, voxel_size=0.5, budget=4096)
    cfg = OdometryConfig(keyframe_voxel_size=0.25)
    return m, sub, cfg


def test_sharded_icp_matches_single_device(matching_setup):
    """Query-sharded align (psum'd 6x6) == single-device align, exactly."""
    m, sub, cfg = matching_setup
    guess = se3.Pose(
        jnp.asarray([0.08, -0.05, 0.02], jnp.float32),
        se3.quat_from_axis_angle(jnp.asarray([0.0, 0, 1.0], jnp.float32), 0.01),
    )
    moved = se3.transform_points(se3.inverse(guess), sub.xyz)

    ref = icp.align(m, moved, sub.valid, se3.Pose.identity(), cfg)

    mesh = mesh_lib.make_mesh(dp=1, sp=8)
    align_sp = icp.make_align(cfg, axis_name="sp")

    def device_fn(m_, xyz_, valid_, guess_):
        return align_sp(m_, xyz_, valid_, guess_)

    sharded = jax.jit(
        jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(P(), P("sp"), P("sp"), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    res = sharded(m, moved, sub.valid, se3.Pose.identity())

    np.testing.assert_allclose(np.asarray(res.pose.t), np.asarray(ref.pose.t), atol=1e-5)
    assert abs(float(jnp.sum(res.pose.q * ref.pose.q))) > 1.0 - 1e-6
    assert int(res.num_matches) == int(ref.num_matches)


def test_batched_dp_odometry_matches_sequential():
    """8 sequences sharded dp=8: each trajectory equals its single-device run."""
    drives = [
        simulate_sequence(num_scans=4, width=900, seed=s, speed=2.0 + 0.3 * s, yaw_rate=0.03 * s)
        for s in range(2)
    ]
    # batch of 8 = each drive 4x (checks per-sequence isolation too)
    batch_drives = [drives[i % 2] for i in range(8)]

    mesh = mesh_lib.make_mesh(dp=8, sp=1)
    run = batched.make_batched_sequence_runner(CFG, mesh)

    def stack_scans(drive):
        scans = [
            scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], CFG.max_raw_points)
            for s in drive.scans
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    per_seq = [stack_scans(d) for d in batch_drives]
    scans_b = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *per_seq)  # (S, B, ...)
    state_b = batched.init_batched_state(CFG, 8)

    final_b, diags_b = run(state_b, scans_b)

    # single-device reference for each distinct drive
    for i, drive in enumerate(drives):
        odo = odometry.LidarOdometry(CFG)
        for s in drive.scans:
            odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        expect_t = odo.get_current_pose()[0]
        for b in (i, i + 2, i + 4, i + 6):
            np.testing.assert_allclose(
                np.asarray(final_b.current.t[b]), expect_t, atol=1e-5,
                err_msg=f"batch lane {b} (drive {i})",
            )


def test_dp_sp_combined_mesh():
    """dp=2 x sp=4: batched sequences with intra-sequence sharded ICP."""
    drive = simulate_sequence(num_scans=3, width=900, seed=11, speed=2.0, yaw_rate=0.05)
    mesh = mesh_lib.make_mesh(dp=2, sp=4)
    run = batched.make_batched_sequence_runner(CFG, mesh)

    scans = [
        scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], CFG.max_raw_points)
        for s in drive.scans
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    scans_b = jax.tree.map(lambda x: jnp.stack([x, x], axis=1), stacked)  # (S, 2, ...)
    state_b = batched.init_batched_state(CFG, 2)

    final_b, _ = run(state_b, scans_b)

    odo = odometry.LidarOdometry(CFG)
    for s in drive.scans:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    expect_t = odo.get_current_pose()[0]
    for b in range(2):
        np.testing.assert_allclose(np.asarray(final_b.current.t[b]), expect_t, atol=1e-4)


def test_determinism_bitwise():
    """Two runs of the same jitted step produce bitwise-identical states —
    the TPU analogue of race-freedom (SURVEY.md §5)."""
    drive = simulate_sequence(num_scans=3, width=900, seed=5)
    outs = []
    for _ in range(2):
        odo = odometry.LidarOdometry(CFG)
        for s in drive.scans:
            odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        outs.append((odo.get_current_pose()[0].copy(), odo.state.keyframe.keys))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(np.asarray(outs[0][1]), np.asarray(outs[1][1]))
