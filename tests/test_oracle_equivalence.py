"""Redundancy check: JAX engine vs the independent NumPy oracle pipeline.

The two implementations share no hot-path code (static sorted-key arrays +
GN einsums vs python dicts + per-point loops); trajectory agreement on the
same simulated drive is strong evidence both implement the documented
reference semantics. Agreement bar: ATE between the two well under the
pipeline's own accuracy envelope.
"""

import numpy as np

from lidar_odometry_demo_tpu.config import OdometryConfig, reference_parity
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.oracle.full_pipeline import OracleOdometry
from lidar_odometry_demo_tpu.pipeline import odometry

# budgets must COVER the worst case (16 x 450 = 7200 points) — undersized
# downsample budgets silently truncate and diverge from exact semantics
CFG = OdometryConfig(
    scan_width=450,            # small but dense enough for the classifier
    max_raw_points=8192,
    max_planar_points=8192,
    max_match_points=8192,
    max_update_points=8192,
    map_capacity=32768,
)


def test_jax_matches_numpy_oracle_trajectory():
    drive = simulate_sequence(num_scans=8, width=CFG.scan_width, seed=21,
                              speed=2.0, yaw_rate=0.05)

    jax_odo = odometry.LidarOdometry(CFG)
    oracle = OracleOdometry(CFG)
    jax_traj, oracle_traj = [], []
    for s in drive.scans:
        jax_odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        oracle.process(s["xyz"], s["ring"], s["time"])
        jax_traj.append(jax_odo.get_current_pose()[0])
        oracle_traj.append(oracle.current.t.copy())

    jax_traj = np.asarray(jax_traj)
    oracle_traj = np.asarray(oracle_traj)
    err = np.linalg.norm(jax_traj - oracle_traj, axis=1)
    # both must have moved (8 scans x 0.1 s at speed 2.0 with the default
    # 2 s acceleration ramp covers ~0.32 m)
    assert np.linalg.norm(jax_traj[-1]) > 0.2
    # implementations agree to well under the accuracy envelope
    assert err.max() < 0.05, (err, jax_traj[-1], oracle_traj[-1])


def test_strict_reference_parity_mode_matches_oracle():
    """End-to-end guard for the REFERENCE_PARITY preset: the engine's three
    beyond-reference defaults flipped to strict reference semantics
    (backwards deskew translation per cloud_transform.h:29-30, re-search
    every outer iteration per cloud_matcher.cpp:138-139, full 35-round
    budget with the final-round pose kept at the cap per
    cloud_matcher.cpp:117,175-177) must agree trajectory-level with the
    NumPy oracle running the same mode. The flags are individually
    op-tested elsewhere; this is the only test exercising the full parity
    path through the pipeline."""
    cfg = reference_parity(CFG)
    assert cfg.deskew_forward_translation is False
    assert cfg.icp_cached_candidates is False
    assert cfg.icp_stall_exit_rounds == cfg.icp_max_outer_iterations
    assert cfg.icp_best_pose_exit is False

    drive = simulate_sequence(num_scans=8, width=CFG.scan_width, seed=21,
                              speed=2.0, yaw_rate=0.05)

    jax_odo = odometry.LidarOdometry(cfg)
    oracle = OracleOdometry(cfg)
    jax_traj, oracle_traj = [], []
    for s in drive.scans:
        jax_odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        oracle.process(s["xyz"], s["ring"], s["time"])
        jax_traj.append(jax_odo.get_current_pose()[0])
        oracle_traj.append(oracle.current.t.copy())

    jax_traj = np.asarray(jax_traj)
    oracle_traj = np.asarray(oracle_traj)
    err = np.linalg.norm(jax_traj - oracle_traj, axis=1)
    assert np.linalg.norm(jax_traj[-1]) > 0.2
    assert err.max() < 0.05, (err, jax_traj[-1], oracle_traj[-1])
