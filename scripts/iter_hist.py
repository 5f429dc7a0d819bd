"""Iteration-count + match-count per scan for the bench sequence."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

cfg = OdometryConfig()
num_scans = 40
drive = simulate_sequence(num_scans=num_scans, width=cfg.scan_width, seed=42, speed=5.0, yaw_rate=0.08)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points) for s in drive.scans]
stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *scans))
run = odometry.make_sequence_runner(cfg)
state0 = odometry.init_state(cfg)
state, diags = run(state0, stacked)
iters = np.asarray(diags.icp_iterations)
matches = np.asarray(diags.num_matches)
steps = np.asarray(diags.icp_step_norm)
print("iters:", iters.tolist())
print("matches:", matches.tolist())
print("step_norm:", [float(f"{s:.2e}") for s in steps])
print(f"mean iters {iters.mean():.1f}, total {iters.sum()}")
