"""Marginal cost of one ICP outer round in the REAL pipeline.

Times the full 40-scan run with icp_max_outer_iterations capped at 1/2/4/8;
the slope is the true per-round cost (dispatch/fusion context identical to
production), the intercept is everything else in the step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

n = 40
base = OdometryConfig()
drive = simulate_sequence(num_scans=n, width=base.scan_width, seed=42,
                          speed=5.0, yaw_rate=0.08)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         base.max_raw_points) for s in drive.scans]
stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *scans))

for cap in (1, 2, 4, 8):
    cfg = dataclasses.replace(base, icp_max_outer_iterations=cap)
    run = odometry.make_sequence_runner(cfg)
    state0 = odometry.init_state(cfg)
    state, diags = run(state0, stacked)
    _ = float(jnp.sum(state.current.t))
    ts = []
    for rep in range(2):
        jit = stacked._replace(xyz=stacked.xyz + np.float32(1e-4 * (rep + 1)))
        jit = jax.device_put(jit)
        _ = float(jnp.sum(jit.xyz))
        t0 = time.time()
        state, diags = run(state0, jit)
        _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
        ts.append(time.time() - t0)
    it = np.asarray(diags.icp_iterations)
    print(f"cap={cap}: {1e3*min(ts)/n:6.1f} ms/scan   mean iters {it.mean():.2f}",
          flush=True)
