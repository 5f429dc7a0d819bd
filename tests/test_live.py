"""Live UDP ingestion: encode_vlp16_packets -> loopback socket ->
ScanAssembler -> native decode -> online pipeline.

Closes the reference's live L4 loop (lidar_odometry_node.cpp:45-108): the
odometry consumes a STREAM of 1206-byte packets, assembles revolutions by
azimuth sweep, and tracks the same trajectory as the direct-array path.
"""

import socket
import threading

import numpy as np
import pytest

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io import live, native
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


def _drive_packets(drive):
    for s in drive.scans:
        yield encode_vlp16_packets(s["range_image"], s["scan_start"])


def test_scan_assembler_cuts_revolutions():
    """Packets split at full-azimuth sweep: each encoded scan comes back
    out as exactly one revolution regardless of packet chunking."""
    drive = simulate_sequence(num_scans=3, width=CFG.scan_width, seed=7)
    stream = []
    for log in _drive_packets(drive):
        stream += [log[i:i + live.PACKET_SIZE]
                   for i in range(0, len(log), live.PACKET_SIZE)]
    scans = list(live.scans_from_packet_stream(iter(stream)))
    assert len(scans) == 3
    per_scan = len(stream) // 3
    for s in scans:
        assert len(s) % live.PACKET_SIZE == 0
        # all packets of one encoded scan end up in the same revolution
        assert abs(len(s) // live.PACKET_SIZE - per_scan) <= 1


def test_udp_loopback_matches_direct_pipeline():
    """Full live loop over a real UDP socket: sender thread streams the
    encoded drive; the listener assembles, decodes natively, and runs
    odometry online. Trajectory must match the direct-array pipeline."""
    drive = simulate_sequence(num_scans=6, width=CFG.scan_width, seed=21,
                              speed=2.0, yaw_rate=0.05)

    # direct path (ground truth for the comparison)
    odo_direct = odometry.LidarOdometry(CFG)
    direct = []
    for s in drive.scans:
        odo_direct.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        direct.append(odo_direct.get_current_pose()[0])
    direct = np.asarray(direct)

    # pick a free port
    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    started = threading.Event()

    def sender():
        started.wait(5.0)
        out = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for log in _drive_packets(drive):
            for i in range(0, len(log), live.PACKET_SIZE):
                out.sendto(log[i:i + live.PACKET_SIZE], ("127.0.0.1", port))
        out.close()

    th = threading.Thread(target=sender, daemon=True)
    th.start()

    odo_live = odometry.LidarOdometry(CFG)
    got = []

    def on_scan(i, t, diag):
        got.append(t)

    def packets():
        started.set()
        yield from live.udp_packets("127.0.0.1", port, timeout_s=8.0)

    # the 6th revolution only completes when a 7th scan's first packet
    # arrives, so the live path sees 5 full revolutions + flush of the tail
    n = live.run_live(odo_live, packets(), on_scan=on_scan,
                      flush_partial=True)
    th.join(10.0)
    assert n >= 5, n
    got = np.asarray(got)
    err = np.linalg.norm(got - direct[:n], axis=1)
    # wire-format quantization (2 mm ranges) + centideg azimuths only
    assert err.max() < 0.05, err
    assert np.linalg.norm(direct[n - 1]) > 0.1  # the drive really moved
