"""CLI smoke tests (CPU, tiny)."""

import numpy as np

from lidar_odometry_demo_tpu import cli
from lidar_odometry_demo_tpu.io import trajectory


def test_sim_and_refine(tmp_path, monkeypatch):
    import lidar_odometry_demo_tpu.config as cfg_mod

    # shrink shapes for CPU speed
    small = cfg_mod.OdometryConfig(
        scan_width=900, max_raw_points=16384, max_planar_points=8192,
        max_match_points=2048, max_update_points=8192, map_capacity=32768,
    )
    monkeypatch.setattr(cli, "_load_config", lambda args: small)

    out = str(tmp_path / "traj.tum")
    kf = str(tmp_path / "kf.pcd")
    cli.main(["sim", "--scans", "5", "--out", out, "--keyframe-out", kf, "--quiet"])
    stamps, t, q = trajectory.read_tum(out)
    assert t.shape == (5, 3)
    assert np.isfinite(t).all()

    refined = str(tmp_path / "refined.tum")
    cli.main(["refine", out, "--out", refined, "--iterations", "2"])
    _, t2, _ = trajectory.read_tum(refined)
    assert t2.shape == t.shape
