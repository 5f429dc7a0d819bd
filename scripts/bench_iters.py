"""How many ICP outer iterations does the bench sim actually run?"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry


def main():
    cfg = OdometryConfig()
    num_scans = 40
    drive = simulate_sequence(num_scans=num_scans, width=cfg.scan_width, seed=42,
                              speed=5.0, yaw_rate=0.08)
    scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                             cfg.max_raw_points) for s in drive.scans]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    stacked = jax.device_put(stacked)
    run = odometry.make_sequence_runner(cfg)
    state0 = odometry.init_state(cfg)
    t0 = time.time()
    state, diags = run(state0, stacked)
    iters = np.asarray(diags.icp_iterations)
    print(f"wall (compile+run) {time.time()-t0:.1f}s", file=sys.stderr)
    print("iters per scan:", iters.tolist())
    print("total outer iters:", int(iters.sum()), "mean:", float(iters.mean()))
    print("matches:", np.asarray(diags.num_matches).tolist())
    print("step_norm:", np.round(np.asarray(diags.icp_step_norm), 6).tolist())
    print("diverged:", np.asarray(diags.diverged).astype(int).tolist())


if __name__ == "__main__":
    main()
