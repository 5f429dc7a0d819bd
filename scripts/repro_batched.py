"""Reproduce the batched-bench TPU fault in isolation.

Usage: python scripts/repro_batched.py [B] [num_scans] [width]
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
from lidar_odometry_demo_tpu.parallel import batched

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
num_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 4
width = int(sys.argv[3]) if len(sys.argv) > 3 else 1800

cfg = OdometryConfig(scan_width=width, max_raw_points=max(32768, 1 << (16 * width - 1).bit_length()))
print(f"devices={jax.devices()} B={B} scans={num_scans} W={cfg.scan_width}", flush=True)

drive = simulate_sequence(num_scans=num_scans, width=cfg.scan_width, seed=42, speed=5.0, yaw_rate=0.08)
scans = [
    scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
    for s in drive.scans
]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

vstep = jax.vmap(odometry.make_process_scan(cfg))

@jax.jit
def run_b(state_b, scans_b):
    return jax.lax.scan(vstep, state_b, scans_b)

scans_b = jax.tree.map(
    lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], B, *x.shape[1:])), stacked
)
state_b0 = batched.init_batched_state(cfg, B)
t0 = time.time()
out = run_b(state_b0, scans_b)
jax.block_until_ready(out)
print(f"first run ok in {time.time()-t0:.1f}s", flush=True)
v = float(jnp.sum(out[0].current.t))
print(f"fetch ok, sum t = {v}", flush=True)
t0 = time.time()
out = run_b(state_b0, scans_b)
_ = float(jnp.sum(out[0].current.t))
dt = time.time() - t0
print(f"steady: {dt:.2f}s = {num_scans*B/dt:.1f} scans/s", flush=True)
