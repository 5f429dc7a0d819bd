"""Ablation timing of the vmapped (batched) odometry step at B lanes.

Compares per-lane-scan cost of the vmapped pipeline against the single
sequence numbers from profile_ablate.py to find which stage degrades under
vmap. Same methodology: whole lax.scan program, value-fetch barrier,
jittered inputs per rep.

Usage: python scripts/profile_batched.py [B] [n_scans]
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
from lidar_odometry_demo_tpu.parallel import batched
from lidar_odometry_demo_tpu.pipeline import odometry
from profile_ablate import make_step  # reuse the stage-toggled step builder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
n_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 10

cfg = OdometryConfig()
drive = simulate_sequence(num_scans=n_scans, width=cfg.scan_width, seed=1, speed=5.0)
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
scans_b = jax.tree.map(
    lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], B, *x.shape[1:])).copy(), stacked)
scans_b = jax.device_put(scans_b)
state_b0 = batched.init_batched_state(cfg, B)


def time_variant(name, step, reps=2):
    vstep = jax.vmap(step)

    @jax.jit
    def run(state, scans):
        return jax.lax.scan(vstep, state, scans)

    state, diags = run(state_b0, scans_b)
    _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
    times = []
    for rep in range(reps):
        jit_in = scans_b._replace(xyz=scans_b.xyz + np.float32(1e-4 * (rep + 1)))
        jit_in = jax.device_put(jit_in)
        _ = float(jnp.sum(jit_in.xyz))
        t0 = time.time()
        state, diags = run(state_b0, jit_in)
        _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
        times.append(time.time() - t0)
    ms = 1e3 * min(times) / (n_scans * B)
    print(f"{name:44s} {ms:9.2f} ms/lane-scan", flush=True)
    return ms


print(f"B={B} scans={n_scans} devices={jax.devices()}", file=sys.stderr)
time_variant("full", make_step(cfg))
time_variant("no icp", make_step(cfg, icp_on=False))
time_variant("no map_update", make_step(cfg, map_on=False))
time_variant("no icp, no map", make_step(cfg, icp_on=False, map_on=False))
time_variant("no pre (fake planar)", make_step(cfg, pre_on=False))
time_variant("no downsample", make_step(cfg, ds_on=False))
