"""Trajectory accuracy on REAL geometry (VERDICT r3 stretch #8).

Every other trajectory-level number rests on the synthetic box world;
here a multi-scan VLP16 sequence is splatted from the reference's
bundled BlenSor intersection scan (59,691 real points,
reference test/test_data/intersection00056.pcd) along a moving
trajectory, and the full pipeline's aligned ATE is gated against ground
truth.
"""

import os

import numpy as np
import pytest

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io import real_world
from lidar_odometry_demo_tpu.io.trajectory import ate_rmse
from lidar_odometry_demo_tpu.pipeline import odometry

pytestmark = pytest.mark.skipif(
    not os.path.exists(real_world.REFERENCE_FIXTURE),
    reason="reference intersection fixture not mounted",
)

CFG = OdometryConfig(
    scan_width=900,
    max_raw_points=16384,
    max_planar_points=8192,
    max_match_points=4096,
    max_update_points=8192,
    map_capacity=65536,
)


def test_real_geometry_long_loop_drive():
    """200-scan closed loop over real geometry (VERDICT r4 stretch #10):
    a full constant-curvature circle through the intersection with a
    25 m cleanup range, so radius eviction + origin rebase + re-insert
    run over REAL structure, gated on aligned ATE after loop closure."""
    import jax
    import jax.numpy as jnp

    from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy

    world = real_world.load_fixture()
    cfg = CFG.replace(keyframe_cleanup_range=25.0)
    # yaw_rate * 200 scans * 0.1 s = 2*pi: the path closes exactly at a
    # gentle 1.8 deg/scan; radius = speed / yaw_rate ~= 8 m inside the
    # ~35 m-dense fixture (36 deg/s closed the loop in 100 scans but
    # drifted 1.3 m — rotation rate drives LOAM-style drift)
    drive = real_world.splat_sequence(
        world, num_scans=200, width=cfg.scan_width, speed=2.5,
        yaw_rate=2.0 * np.pi / 20.0)
    sizes = [s["xyz"].shape[0] for s in drive.scans]
    assert min(sizes) > 2000, sizes

    scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                             cfg.max_raw_points) for s in drive.scans]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    run = odometry.make_sequence_runner(cfg)
    state, diags = run(odometry.init_state(cfg), stacked)

    est = np.asarray(diags.pose.t)
    from scipy.spatial.transform import Rotation

    g0 = Rotation.from_quat(
        [drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]])
    gt_rel = g0.inv().apply(drive.gt_t - drive.gt_t[0])
    # the loop actually closes (end near start) and spans real distance
    assert np.linalg.norm(gt_rel[-1] - gt_rel[0]) < 2.0
    assert np.ptp(gt_rel[:, :2], axis=0).min() > 10.0
    ate = ate_rmse(est, gt_rel, align=True)
    assert ate < 0.3, f"aligned ATE {ate:.3f} m over the 200-scan loop"
    # eviction really ran: with a 25 m range in a ~35 m world the far
    # side evicts as the sensor goes around — occupancy must shrink at
    # least once, not grow monotonically
    mv = np.asarray(diags.map_voxels)
    assert (np.diff(mv) < 0).any(), "no eviction observed over the loop"
    assert not bool(np.asarray(diags.diverged).any())


def test_real_geometry_drive_ate():
    world = real_world.load_fixture()
    assert world is not None and world.shape[0] > 50000

    drive = real_world.splat_sequence(
        world, num_scans=12, width=CFG.scan_width, speed=1.5, yaw_rate=0.03)
    # the splat really sees the intersection geometry
    sizes = [s["xyz"].shape[0] for s in drive.scans]
    assert min(sizes) > 2000, sizes

    odo = odometry.LidarOdometry(CFG)
    est = []
    for s in drive.scans:
        diag = odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        est.append(odo.get_current_pose()[0])
    est = np.asarray(est)

    from scipy.spatial.transform import Rotation

    g0 = Rotation.from_quat(
        [drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]])
    gt_rel = g0.inv().apply(drive.gt_t - drive.gt_t[0])
    # the drive really moved, and the estimate tracked REAL-world geometry
    assert np.linalg.norm(gt_rel[-1]) > 1.0
    ate = ate_rmse(est, gt_rel, align=True)
    assert ate < 0.1, f"aligned ATE {ate:.3f} m on the real-geometry drive"
    # the map is made of real intersection structure
    assert int(odo.state.keyframe.count.sum()) > 10000
