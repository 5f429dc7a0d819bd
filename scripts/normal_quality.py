"""Measure classifier normal quality vs ground truth in the simulated world.

The sim world is ground plane + axis-aligned boxes, so every true surface
normal is one of +-x, +-y, +-z. For each planar point the classifier emits,
compare its normal to the nearest axis direction.

Usage: python scripts/normal_quality.py [width ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops import classifier, preprocess
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy

widths = [int(a) for a in sys.argv[1:]] or [900, 1800]
for W in widths:
    cfg = OdometryConfig(scan_width=W)
    drive = simulate_sequence(num_scans=1, width=W, seed=42, speed=0.0, yaw_rate=0.0)
    s = drive.scans[0]
    scan = scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                           cfg.max_raw_points)
    scan = preprocess.time_normalize(scan)
    planar, _, _ = classifier.classify(scan, cfg)
    xyz = np.asarray(planar.xyz)
    nrm = np.asarray(planar.normal)
    ok = np.asarray(planar.valid)
    xyz, nrm = xyz[ok], nrm[ok]
    # nearest axis direction (sign-insensitive)
    axes = np.eye(3)
    dots = np.abs(nrm @ axes.T)  # (N, 3)
    best = dots.max(axis=1)
    ang = np.degrees(np.arccos(np.clip(best, -1, 1)))
    print(f"W={W}: planar={len(xyz)} normal-angle-err deg: "
          f"mean={ang.mean():.2f} median={np.median(ang):.2f} "
          f"p90={np.percentile(ang, 90):.2f} p99={np.percentile(ang, 99):.2f} "
          f">10deg: {(ang > 10).mean()*100:.1f}%", flush=True)
