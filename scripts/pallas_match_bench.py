"""TPU timing: the Pallas ICP kernels vs their XLA formulations.

Times the full odometry sequence at the bench shapes for each variant:
xla (both off), match (icp_use_pallas), jtwj (icp_use_pallas_jtwj), and
both. The results decide the shipped defaults (DESIGN.md "Pallas
status" r4 table).

Usage: python scripts/pallas_match_bench.py [B]
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
from lidar_odometry_demo_tpu.parallel import batched
from lidar_odometry_demo_tpu.pipeline import odometry

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
n_scans = 10

drive = simulate_sequence(num_scans=n_scans, width=1800, seed=1, speed=5.0)


def run_variant(name: str, **flags):
    cfg = OdometryConfig(**flags)
    scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                             cfg.max_raw_points) for s in drive.scans]
    stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *scans))
    if B == 1:
        scans_in, state0 = stacked, odometry.init_state(cfg)
        step = odometry.make_process_scan(cfg)
    else:
        scans_in = jax.device_put(jax.tree.map(
            lambda x: jnp.broadcast_to(
                x[:, None], (x.shape[0], B, *x.shape[1:])).copy(), stacked))
        state0 = batched.init_batched_state(cfg, B)
        step = jax.vmap(odometry.make_process_scan(cfg))

    @jax.jit
    def run(s, xs):
        return jax.lax.scan(step, s, xs)

    t0 = time.time()
    state, diags = run(state0, scans_in)
    _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
    c = time.time() - t0
    ts = []
    for rep in range(3):
        jit_in = scans_in._replace(xyz=scans_in.xyz + np.float32(1e-4 * (rep + 1)))
        jit_in = jax.device_put(jit_in)
        _ = float(jnp.sum(jit_in.xyz))
        t0 = time.time()
        state, diags = run(state0, jit_in)
        _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
        ts.append(time.time() - t0)
    ms = 1e3 * min(ts) / (n_scans * B)
    print(f"{name}: {ms:.2f} ms/lane-scan "
          f"({n_scans*B/min(ts):.1f} scans/s, compile {c:.0f}s), "
          f"last t={np.round(np.asarray(state.current.t).reshape(-1,3)[0], 3)}",
          flush=True)
    return ms


print(f"B={B} devices={jax.devices()}", file=sys.stderr)
xla_ms = run_variant("xla")
match_ms = run_variant("pallas-match", icp_use_pallas=True)
jtwj_ms = run_variant("pallas-jtwj", icp_use_pallas_jtwj=True)
both_ms = run_variant("pallas-both", icp_use_pallas=True,
                      icp_use_pallas_jtwj=True)
print(f"speedups vs xla: match {xla_ms/match_ms:.3f}x, "
      f"jtwj {xla_ms/jtwj_ms:.3f}x, both {xla_ms/both_ms:.3f}x", flush=True)
