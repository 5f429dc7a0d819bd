"""Quantify the reference's backwards translation-deskew against sim GT.

The reference interpolates deskew translation backwards in time
(start.t * t + end.t * (1-t), reference src/utils/cloud_transform.h:29-30)
while rotation slerps forward. This script measures what each formula leaves
behind versus exact ground-truth deskew on a simulated full-speed scan.

Observed (W=1800, 5 m/s, yaw 0.08, scan 25):
    ref    : mean 0.27 m, max 0.50 m   (barely better than no deskew)
    fixed  : mean 0.0003 m, max 0.0005 m
This is why config.deskew_forward_translation defaults to True.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.spatial.transform import Rotation, Slerp

from lidar_odometry_demo_tpu.io.simulator import simulate_sequence

SPEED, YAW_RATE, RAMP = 5.0, 0.08, 2.0
drive = simulate_sequence(num_scans=26, width=1800, seed=42, speed=SPEED,
                          yaw_rate=YAW_RATE, range_noise=0.0, ramp_time=RAMP)
s = drive.scans[25]
xyz, t_raw = s["xyz"].astype(np.float64), s["time"].astype(np.float64)
tn = (t_raw - t_raw.min()) / (t_raw.max() - t_raw.min())


def arc(t):
    if t < RAMP:
        return SPEED * t * t / (2 * RAMP)
    return SPEED * (t - 0.5 * RAMP)


def pose_at(t):
    st = arc(t)
    r = SPEED / YAW_RATE
    yaw = st / r
    return np.array([r * np.sin(yaw), r * (1 - np.cos(yaw)), 1.8]), \
        Rotation.from_euler("z", yaw)


t0 = 25 * 0.1
n = 2000
t_abs = (t0 + t_raw)[:n]
xyz, tn = xyz[:n], tn[:n]
world = np.stack([pose_at(ta)[1].apply(p) + pose_at(ta)[0]
                  for ta, p in zip(t_abs, xyz)])
p_end, r_end = pose_at(t0 + 0.1)
gt_end_frame = r_end.inv().apply(world - p_end)

p_prev, r_prev = pose_at(t0)
rel_R = r_prev.inv() * r_end
rel_t = r_prev.inv().apply(p_end - p_prev)
ri_R = rel_R.inv()
ri_t = ri_R.apply(-rel_t)


def deskew(formula):
    sl = Slerp([0, 1], Rotation.concatenate([ri_R, Rotation.identity()]))
    out = sl(tn).apply(xyz)
    w = tn if formula == "ref" else (1.0 - tn)
    return out + ri_t[None, :] * w[:, None]


for f in ("ref", "fixed"):
    err = np.linalg.norm(deskew(f) - gt_end_frame, axis=1)
    print(f"{f:6s}: mean={err.mean():.4f} max={err.max():.4f}")
raw_err = np.linalg.norm(xyz - gt_end_frame, axis=1)
print(f"no-deskew: mean={raw_err.mean():.4f} max={raw_err.max():.4f}")
