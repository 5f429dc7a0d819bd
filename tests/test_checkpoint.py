"""Checkpoint/resume: trajectory continues identically after reload."""

import numpy as np

from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.pipeline import odometry
from lidar_odometry_demo_tpu.utils import checkpoint
from tests.test_pipeline import TEST_CFG


def test_npz_roundtrip_resumes_identically(tmp_path):
    drive = simulate_sequence(num_scans=6, width=900, seed=9, speed=2.5, yaw_rate=0.05)

    # run 3 scans, checkpoint, run 3 more
    odo = odometry.LidarOdometry(TEST_CFG)
    for s in drive.scans[:3]:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    path = str(tmp_path / "state.npz")
    checkpoint.save_npz(path, odo.state)
    for s in drive.scans[3:]:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    expect_t, expect_q = odo.get_current_pose()

    # resume from checkpoint in a fresh engine
    odo2 = odometry.LidarOdometry(TEST_CFG)
    odo2.state = checkpoint.load_npz(path)
    for s in drive.scans[3:]:
        odo2.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    got_t, got_q = odo2.get_current_pose()

    np.testing.assert_array_equal(got_t, expect_t)  # bitwise resume
    np.testing.assert_array_equal(got_q, expect_q)


def test_corrupt_checkpoint_rejected(tmp_path):
    import pytest

    np.savez_compressed(str(tmp_path / "bad.npz"), **{"current.t": np.zeros(3)})
    with pytest.raises(ValueError, match="unrecognized checkpoint layout|missing fields"):
        checkpoint.load_npz(str(tmp_path / "bad.npz"))
