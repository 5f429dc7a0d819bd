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


def test_orbax_roundtrip_resumes_identically(tmp_path):
    """Orbax path (async/multi-host-capable checkpointing): save -> restore
    -> identical resumed trajectory (the npz test's twin for the orbax
    backend, previously untested)."""
    drive = simulate_sequence(num_scans=5, width=900, seed=9, speed=2.5,
                              yaw_rate=0.05)
    odo = odometry.LidarOdometry(TEST_CFG)
    for s in drive.scans[:2]:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save_orbax(path, odo.state)
    for s in drive.scans[2:]:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    expect_t, _ = odo.get_current_pose()

    odo2 = odometry.LidarOdometry(TEST_CFG)
    odo2.state = checkpoint.load_orbax(path, odometry.init_state(TEST_CFG))
    for s in drive.scans[2:]:
        odo2.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    got_t, _ = odo2.get_current_pose()
    np.testing.assert_array_equal(got_t, expect_t)


def test_legacy_v1_checkpoint_migrates(tmp_path):
    """A round-1-layout npz (keys/count/pts/nrm in key order, no version
    tag) must load through the migration path into a working state."""
    from lidar_odometry_demo_tpu.ops import voxel_map as vm

    drive = simulate_sequence(num_scans=3, width=900, seed=9, speed=2.5)
    odo = odometry.LidarOdometry(TEST_CFG)
    for s in drive.scans:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    m = odo.state.keyframe
    legacy = {
        "keyframe.keys": np.asarray(m.keys),
        "keyframe.count": np.asarray(m.count),
        "keyframe.pts": np.asarray(m.pts),
        "keyframe.nrm": np.asarray(m.nrm),
        "keyframe.origin": np.asarray(m.origin),
        "current.t": np.asarray(odo.state.current.t),
        "current.q": np.asarray(odo.state.current.q),
        "previous.t": np.asarray(odo.state.previous.t),
        "previous.q": np.asarray(odo.state.previous.q),
    }
    path = str(tmp_path / "legacy.npz")
    np.savez_compressed(path, **legacy)
    state = checkpoint.load_npz(path)
    # migrated map matches the live one where it counts
    np.testing.assert_array_equal(np.asarray(state.keyframe.keys), np.asarray(m.keys))
    np.testing.assert_array_equal(np.asarray(state.keyframe.count), np.asarray(m.count))
    np.testing.assert_array_equal(np.asarray(state.keyframe.pts), np.asarray(m.pts))
    assert int(vm.map_size(state.keyframe)) == int(vm.map_size(m))


def test_legacy_v3_checkpoint_migrates(tmp_path):
    """A round-3 136-lane fused-table npz (format_version=3: int count lane
    at MB+1, anchor at MB+2..MB+5) must migrate into the v4 128-lane layout
    with keys/count/pts/nrm/anchor preserved — including for max_points
    values where v3 and v4 table widths coincide and only the version tag
    can distinguish them (ADVICE r3 #2/#3)."""
    from lidar_odometry_demo_tpu.ops import voxel_map as vm

    drive = simulate_sequence(num_scans=3, width=900, seed=9, speed=2.5)
    # K=10 is one of the width-colliding values: v3 and v4 both get W=96
    cfg = TEST_CFG.replace(keyframe_max_points_cnt=10)
    odo = odometry.LidarOdometry(cfg)
    for s in drive.scans:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    m = odo.state.keyframe
    k = m.max_points
    c = m.capacity

    # build the v3 table via the OLD lane math: RW = align8(3K+1),
    # MB_old = align8(RW+3K); key at MB_old, int count at MB_old+1,
    # anchor at MB_old+2..MB_old+5, W_old = align8(MB_old + 5)
    align8 = lambda n: -(-n // 8) * 8
    rw = align8(3 * k + 1)
    mb_old = align8(rw + 3 * k)
    w_old = align8(mb_old + 5)
    tab3 = np.zeros((c, w_old), np.int32)
    tab3[:, : 3 * k] = np.asarray(m.pts).reshape(c, 3 * k).view(np.int32)
    tab3[:, 3 * k] = np.asarray(m.count).astype(np.float32).view(np.int32)
    tab3[:, rw : rw + 3 * k] = np.asarray(m.nrm).reshape(c, 3 * k).view(np.int32)
    tab3[:, mb_old] = np.asarray(m.keys)
    tab3[:, mb_old + 1] = np.asarray(m.count)
    tab3[:, mb_old + 2 : mb_old + 5] = np.asarray(m.anchor).view(np.int32)

    v3 = {
        "keyframe.tab": tab3,
        "keyframe.origin": np.asarray(m.origin),
        "keyframe.kdim": np.zeros((1, k), np.int32),
        "current.t": np.asarray(odo.state.current.t),
        "current.q": np.asarray(odo.state.current.q),
        "previous.t": np.asarray(odo.state.previous.t),
        "previous.q": np.asarray(odo.state.previous.q),
        "format_version": np.int32(3),
    }
    path = str(tmp_path / "v3.npz")
    np.savez_compressed(path, **v3)
    state = checkpoint.load_npz(path)
    kf = state.keyframe
    np.testing.assert_array_equal(np.asarray(kf.keys), np.asarray(m.keys))
    np.testing.assert_array_equal(np.asarray(kf.count), np.asarray(m.count))
    np.testing.assert_array_equal(np.asarray(kf.pts), np.asarray(m.pts))
    np.testing.assert_array_equal(np.asarray(kf.nrm), np.asarray(m.nrm))
    np.testing.assert_array_equal(np.asarray(kf.anchor), np.asarray(m.anchor))
    assert int(vm.map_size(kf)) == int(vm.map_size(m))


def test_unknown_format_version_rejected(tmp_path):
    import pytest

    odo = odometry.LidarOdometry(TEST_CFG)
    path = str(tmp_path / "vN.npz")
    checkpoint.save_npz(path, odo.state)
    z = dict(np.load(path))
    z["format_version"] = np.int32(99)
    np.savez_compressed(path, **z)
    with pytest.raises(ValueError, match="unknown checkpoint format_version"):
        checkpoint.load_npz(path)


def _legacy_v45_npz(m, state, planar: bool):
    """Synthesize a v4 (interleaved) or v5 (planar) legacy npz dict via the
    OLD lane math: key at MB, anchor at MB+1..MB+4, W = align8(MB + 4)."""
    k = m.max_points
    c = m.capacity
    align8 = lambda n: -(-n // 8) * 8
    rw = align8(3 * k + 1)
    mb = rw + 3 * k
    w_old = align8(mb + 4)
    tab = np.zeros((c, w_old), np.int32)
    pts = np.asarray(m.pts)  # (c, k, 3)
    if planar:
        tab[:, : 3 * k] = (
            np.swapaxes(pts, 1, 2).reshape(c, 3 * k).view(np.int32))
    else:
        tab[:, : 3 * k] = pts.reshape(c, 3 * k).view(np.int32)
    tab[:, 3 * k] = np.asarray(m.count).astype(np.float32).view(np.int32)
    tab[:, rw : rw + 3 * k] = np.asarray(m.nrm).reshape(c, 3 * k).view(np.int32)
    tab[:, mb] = np.asarray(m.keys)
    tab[:, mb + 1 : mb + 4] = np.asarray(m.anchor).view(np.int32)
    return {
        "keyframe.tab": tab,
        "keyframe.origin": np.asarray(m.origin),
        "keyframe.kdim": np.zeros((1, k), np.int32),
        "current.t": np.asarray(state.current.t),
        "current.q": np.asarray(state.current.q),
        "previous.t": np.asarray(state.previous.t),
        "previous.q": np.asarray(state.previous.q),
        "format_version": np.int32(5 if planar else 4),
    }


def _check_v45_migration(tmp_path, planar: bool):
    from lidar_odometry_demo_tpu.ops import voxel_map as vm

    drive = simulate_sequence(num_scans=3, width=900, seed=9, speed=2.5)
    odo = odometry.LidarOdometry(TEST_CFG)
    for s in drive.scans:
        odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
    m = odo.state.keyframe
    path = str(tmp_path / "legacy45.npz")
    np.savez_compressed(path, **_legacy_v45_npz(m, odo.state, planar))
    state = checkpoint.load_npz(path)
    kf = state.keyframe
    np.testing.assert_array_equal(np.asarray(kf.keys), np.asarray(m.keys))
    np.testing.assert_array_equal(np.asarray(kf.count), np.asarray(m.count))
    np.testing.assert_array_equal(np.asarray(kf.pts), np.asarray(m.pts))
    np.testing.assert_array_equal(np.asarray(kf.nrm), np.asarray(m.nrm))
    np.testing.assert_array_equal(np.asarray(kf.anchor), np.asarray(m.anchor))
    assert int(vm.map_size(kf)) == int(vm.map_size(m))


def test_legacy_v4_checkpoint_migrates(tmp_path):
    """A round-4 interleaved-point npz (format_version=4: key lane at MB,
    anchor at MB+1..MB+4) must migrate into the v6 split-vector layout."""
    _check_v45_migration(tmp_path, planar=False)


def test_legacy_v5_checkpoint_migrates(tmp_path):
    """A round-5 planar-point npz (format_version=5) must migrate into the
    v6 split-vector layout — same width for K=20, so only the version tag
    and the vanished key lane distinguish them."""
    _check_v45_migration(tmp_path, planar=True)
