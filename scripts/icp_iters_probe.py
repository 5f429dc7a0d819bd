"""Probe: per-scan ICP outer-iteration counts + per-scan wall time on the
bench drive. Separates "more outer rounds" from "slower rounds" when
chasing step-time regressions.

Usage: python scripts/icp_iters_probe.py [num_scans]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
cfg = OdometryConfig()
drive = simulate_sequence(num_scans=n, width=cfg.scan_width, seed=42,
                          speed=5.0, yaw_rate=0.08)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *scans))

run = odometry.make_sequence_runner(cfg)
state0 = odometry.init_state(cfg)
t0 = time.time()
state, diags = run(state0, stacked)
_ = float(jnp.sum(state.current.t))
print(f"compile+run {time.time()-t0:.1f}s")
t0 = time.time()
state, diags = run(state0, stacked._replace(xyz=stacked.xyz + np.float32(1e-4)))
_ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
dt = time.time() - t0
iters = np.asarray(diags.icp_iterations)
print(f"steady: {1e3*dt/n:.1f} ms/scan ({n/dt:.1f} scans/s)")
print(f"icp outer iters: mean {iters.mean():.1f}  min {iters.min()}  "
      f"max {iters.max()}  total {iters.sum()}")
print("per-scan:", iters.tolist())
ms = np.asarray(diags.num_matches)
print("matches:", ms[:8].tolist(), "...", ms[-4:].tolist())
