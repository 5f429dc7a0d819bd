"""Trace one scan's ICP across outer iterations (pose, step_norm, matches).

Usage: python scripts/trace_icp.py [scan_index]
Runs the bench sequence up to scan k, then replays scan k's alignment with
a recording loop.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops import icp, preprocess, se3, classifier
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

k = int(sys.argv[1]) if len(sys.argv) > 1 else 23
cfg = OdometryConfig()
drive = simulate_sequence(num_scans=k + 1, width=cfg.scan_width, seed=42,
                          speed=5.0, yaw_rate=0.08)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.device_put(jax.tree.map(lambda *xs: jnp.stack(xs), *scans[:k]))
run = odometry.make_sequence_runner(cfg)
state, diags = run(odometry.init_state(cfg), stacked)
jax.block_until_ready(state)
print(f"state after {k} scans: map_voxels={int(vm.map_size(state.keyframe))}")

# replicate process_scan preprocessing for scan k
raw = scans[k]
scan = preprocess.time_normalize(raw)
relative = se3.relative_to(state.previous, state.current)
deskewed = preprocess.deskew(scan, se3.inverse(relative), se3.Pose.identity())
planar, _, _ = classifier.classify(deskewed, cfg)
planar = preprocess.range_filter(planar, cfg.lidar_min_range, cfg.lidar_max_range)
match_ds = vm.downsample(planar, voxel_size=cfg.keyframe_matching_voxel_size,
                         budget=cfg.max_match_points)
guess = se3.compose(state.current, relative)

m = state.keyframe
index = vm.build_search_index(m)

@jax.jit
def trace(pose0):
    def body(pose, _):
        R = se3.quat_to_matrix(pose.q)
        corr = vm.find_correspondences_indexed(
            m, index, match_ds.xyz, match_ds.valid, pose.t, R,
            voxel_size=cfg.keyframe_voxel_size,
            max_distance=cfg.icp_max_correspondence_distance)
        n_matches = jnp.sum(corr.valid.astype(jnp.int32))
        # cost for diagnostics
        p_w = corr.source_local @ R.T + pose.t
        r = jnp.sum((p_w - corr.plane_origin) * corr.plane_normal, axis=-1)
        absr = jnp.abs(r)
        hub = jnp.where(absr <= cfg.icp_huber_delta,
                        0.5 * r * r,
                        cfg.icp_huber_delta * (absr - 0.5 * cfg.icp_huber_delta))
        cost = jnp.sum(jnp.where(corr.valid, hub, 0.0))
        new_pose, step_norm = icp._gn_steps(corr, pose, guess.t, cfg)
        return new_pose, (new_pose.t, new_pose.q, step_norm, n_matches, cost)
    return jax.lax.scan(body, pose0, None, length=cfg.icp_max_outer_iterations)

final, (ts, qs, sn, nm, cost) = trace(guess)
ts = np.asarray(ts); qs = np.asarray(qs); sn = np.asarray(sn)
nm = np.asarray(nm); cost = np.asarray(cost)
print(f"guess t={np.asarray(guess.t)}")
for i in range(cfg.icp_max_outer_iterations):
    print(f"outer {i:2d}: t=[{ts[i,0]:+.4f} {ts[i,1]:+.4f} {ts[i,2]:+.4f}] "
          f"step={sn[i]:.2e} matches={nm[i]} cost={cost[i]:.4f}")
