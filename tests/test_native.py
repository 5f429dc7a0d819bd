"""Native C++ IO runtime vs the pure-NumPy implementations."""

import os
import struct

import numpy as np
import pytest

from lidar_odometry_demo_tpu.io import native, pcd

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built / no toolchain"
)

REF_FIXTURE = "/root/reference/test/test_data/intersection00056.pcd"


def test_native_pcd_matches_python_ascii(tmp_path, rng):
    xyz = rng.normal(size=(200, 3)).astype(np.float32)
    nrm = rng.normal(size=(200, 3)).astype(np.float32)
    path = str(tmp_path / "t.pcd")
    pcd.write_pcd(path, xyz, nrm)
    out = native.read_pcd_fields(path, ["x", "y", "z", "normal_y"])
    np.testing.assert_allclose(out["x"], xyz[:, 0], atol=1e-5)
    np.testing.assert_allclose(out["normal_y"], nrm[:, 1], atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_FIXTURE), reason="fixture not mounted")
def test_native_pcd_matches_python_binary():
    out = native.read_pcd_fields(REF_FIXTURE, ["x", "y", "z"])
    ref = pcd.read_pcd(REF_FIXTURE)
    np.testing.assert_array_equal(out["x"], ref["x"])
    np.testing.assert_array_equal(out["z"], ref["z"])


def _make_vlp16_packet(az_centideg: int, range_mm: int, stamp_us: int = 0) -> bytes:
    """One synthetic 1206-byte VLP16 data packet, all channels same range."""
    pkt = b""
    for b in range(12):
        block = struct.pack("<BBH", 0xFF, 0xEE, (az_centideg + b * 40) % 36000)
        for _ in range(32):  # 2 sequences x 16 channels
            block += struct.pack("<HB", range_mm // 2, 100)  # 2 mm units
        pkt += block
    pkt += struct.pack("<I", stamp_us) + b"\x37\x22"
    assert len(pkt) == 1206
    return pkt


def test_vlp16_decode_geometry():
    # azimuth 0 -> Velodyne frame +Y forward; our frame: x=r sin(az), y=r cos(az)
    pkt = _make_vlp16_packet(az_centideg=0, range_mm=10000)
    xyz, inten, ring, t = native.decode_vlp16_packets(pkt)
    assert xyz.shape[0] == 12 * 2 * 16  # 12 blocks * 2 seq * 16 ch
    r = np.linalg.norm(xyz, axis=1)
    np.testing.assert_allclose(r, 10.0, atol=0.05)
    # ring 0 must be the -15 deg beam
    r0 = xyz[ring == 0]
    elev = np.degrees(np.arcsin(r0[:, 2] / np.linalg.norm(r0, axis=1)))
    np.testing.assert_allclose(elev, -15.0, atol=0.1)
    # ring 15 = +15 deg
    r15 = xyz[ring == 15]
    elev15 = np.degrees(np.arcsin(r15[:, 2] / np.linalg.norm(r15, axis=1)))
    np.testing.assert_allclose(elev15, 15.0, atol=0.1)
    assert np.all(inten == 100.0)
    # timestamps increase along the packet
    assert t[-1] > t[0]


def test_vlp16_zero_range_skipped():
    pkt = _make_vlp16_packet(az_centideg=0, range_mm=0)
    xyz, *_ = native.decode_vlp16_packets(pkt)
    assert xyz.shape[0] == 0
