"""Per-scan absolute translation error vs ground truth over the bench sequence."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

num_scans = int(os.environ.get("NSCANS", "40"))
cfg = OdometryConfig()
for k, v in (kv.split("=") for kv in sys.argv[1:]):
    cfg = cfg.replace(**{k: type(getattr(cfg, k))(v)})
noise = float(os.environ.get("NOISE", "0.004"))
drive = simulate_sequence(num_scans=num_scans, width=cfg.scan_width, seed=42,
                          speed=5.0, yaw_rate=0.08, range_noise=noise)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *scans))
run = odometry.make_sequence_runner(cfg)
state, diags = run(odometry.init_state(cfg), stacked)

g0_R = Rotation.from_quat([drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]])
gt_rel = g0_R.inv().apply(drive.gt_t - drive.gt_t[0])
est = np.asarray(diags.pose.t)
iters = np.asarray(diags.icp_iterations)
err = np.linalg.norm(est - gt_rel, axis=1)
step_err = np.linalg.norm(np.diff(est, axis=0) - np.diff(gt_rel, axis=0), axis=1)
for i in range(num_scans):
    se = step_err[i - 1] if i > 0 else 0.0
    print(f"scan {i:2d}: iters={iters[i]:2d} abs_err={err[i]*100:6.2f} cm  "
          f"step_err={se*100:5.2f} cm")
print(f"final abs err {err[-1]*100:.1f} cm, mean step err {step_err.mean()*100:.2f} cm")
