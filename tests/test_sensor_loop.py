"""Raw-sensor loop: VLP16 wire packets -> native decode -> full pipeline.

The reference's L4 consumes live VLP16 data via the ROS velodyne driver
(reference src/lidar_odometry_node.cpp:45-108); here the equivalent raw
path is the native packet decoder (native/lidar_native.cpp:232-292). This
test closes the loop end-to-end: a simulated drive is ENCODED into real
1206-byte VLP16 data packets, decoded back through the native C++ decoder,
and run through the full odometry pipeline — the trajectory must agree
with the same drive fed directly as point arrays, and with ground truth.
"""

import numpy as np
import pytest

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io import native
from lidar_odometry_demo_tpu.io.simulator import encode_vlp16_packets, simulate_sequence
from lidar_odometry_demo_tpu.pipeline import odometry

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built / no toolchain"
)

CFG = OdometryConfig(
    scan_width=450,
    max_raw_points=8192,
    max_planar_points=8192,
    max_match_points=8192,
    max_update_points=8192,
    map_capacity=32768,
)


def test_packet_log_to_trajectory():
    drive = simulate_sequence(num_scans=8, width=CFG.scan_width, seed=21,
                              speed=2.0, yaw_rate=0.05)

    # encode -> decode through the native VLP16 wire-format path
    odo_pkt = odometry.LidarOdometry(CFG)
    odo_direct = odometry.LidarOdometry(CFG)
    pkt_traj, direct_traj = [], []
    for s in drive.scans:
        log = encode_vlp16_packets(s["range_image"], s["scan_start"])
        xyz, inten, ring, t = native.decode_vlp16_packets(log)
        # geometry must round-trip the wire format (unordered compare via
        # sorted ranges; sub-mm quantization from the 2 mm range units)
        assert xyz.shape[0] == np.isfinite(s["range_image"]).sum()
        np.testing.assert_allclose(
            np.sort(np.linalg.norm(xyz, axis=1)),
            np.sort(np.linalg.norm(s["xyz"], axis=1)),
            atol=2e-3,
        )
        odo_pkt.process_cloud(xyz, inten, ring, t)
        odo_direct.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        pkt_traj.append(odo_pkt.get_current_pose()[0])
        direct_traj.append(odo_direct.get_current_pose()[0])

    pkt_traj = np.asarray(pkt_traj)
    direct_traj = np.asarray(direct_traj)
    # the drive really moved and the raw-packet path tracked it
    assert np.linalg.norm(pkt_traj[-1]) > 0.2
    # packet path == direct path up to range quantization + point ordering
    err = np.linalg.norm(pkt_traj - direct_traj, axis=1)
    assert err.max() < 0.05, err
