"""Experiment: ICP convergence vs damping / step control on the bench sequence.

Usage: python scripts/icp_convergence_exp.py [damping ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.io.trajectory import ate_rmse
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

num_scans = int(os.environ.get("NSCANS", "40"))
cfg0 = OdometryConfig()
drive = simulate_sequence(num_scans=num_scans, width=cfg0.scan_width, seed=42,
                          speed=5.0, yaw_rate=0.08)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg0.max_raw_points) for s in drive.scans]
stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *scans))

g0_R = Rotation.from_quat([drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]])
gt_rel = g0_R.inv().apply(drive.gt_t - drive.gt_t[0])

dampings = [float(a) for a in sys.argv[1:]] or [1e-6, 1e-4, 1e-3, 1e-2, 1e-1]
for d in dampings:
    cfg = cfg0.replace(icp_damping=d)
    run = odometry.make_sequence_runner(cfg)
    state0 = odometry.init_state(cfg)
    state, diags = run(state0, stacked)
    iters = np.asarray(diags.icp_iterations)
    est = np.asarray(diags.pose.t)
    ate = ate_rmse(est, gt_rel, align=True)
    n_cap = int((iters >= cfg.icp_max_outer_iterations).sum())
    print(f"damping={d:g}: total_iters={iters.sum()} capped={n_cap} "
          f"mean={iters.mean():.1f} ATE={ate:.4f} m "
          f"diverged={int(np.asarray(diags.diverged).sum())}", flush=True)
