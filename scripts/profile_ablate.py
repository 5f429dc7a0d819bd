"""Ablation timing of the full sequence program on the current backend.

Per-op host timings are meaningless on the tunneled runtime (async dispatch
+ ~30-45 ms round trip), so instead we compile the WHOLE lax.scan sequence
program with individual stages disabled and compare wall times with a
value-fetch barrier (block_until_ready can return early here).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops import classifier, icp, preprocess, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import LidarScan, scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry
from lidar_odometry_demo_tpu.pipeline.odometry import OdometryState, StepDiagnostics


def make_step(cfg: OdometryConfig, *, icp_on=True, map_on=True, pre_on=True,
              ds_on=True, n_outer=None):
    """process_scan with stages toggled off (replaced by cheap stand-ins)."""
    if n_outer is not None:
        cfg = cfg.replace(icp_max_outer_iterations=n_outer,
                          icp_min_outer_iterations=min(4, n_outer))
    align_fn = icp.make_align(cfg)

    def step(state: OdometryState, raw: LidarScan):
        if pre_on:
            scan = preprocess.time_normalize(raw)
            relative = se3.relative_to(state.previous, state.current)
            previous = state.current
            deskewed = preprocess.deskew(scan, se3.inverse(relative), se3.Pose.identity())
            planar, _, _ = classifier.classify(deskewed, cfg)
            planar = preprocess.range_filter(planar, cfg.lidar_min_range, cfg.lidar_max_range)
        else:
            relative = se3.relative_to(state.previous, state.current)
            previous = state.current
            from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals
            planar = PointsWithNormals(
                xyz=raw.xyz[: cfg.max_planar_points],
                normal=jnp.ones((cfg.max_planar_points, 3), jnp.float32) * 0.577,
                valid=raw.valid[: cfg.max_planar_points],
            )

        if ds_on:
            update_ds = vm.downsample(planar, voxel_size=cfg.keyframe_update_voxel_size,
                                      budget=cfg.max_update_points)
            match_ds = vm.downsample(planar, voxel_size=cfg.keyframe_matching_voxel_size,
                                     budget=cfg.max_match_points)
        else:
            from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals
            update_ds = PointsWithNormals(
                xyz=planar.xyz[: cfg.max_update_points],
                normal=planar.normal[: cfg.max_update_points],
                valid=planar.valid[: cfg.max_update_points])
            match_ds = PointsWithNormals(
                xyz=planar.xyz[: cfg.max_match_points],
                normal=planar.normal[: cfg.max_match_points],
                valid=planar.valid[: cfg.max_match_points])

        initialized = vm.map_size(state.keyframe) > 0
        guess = se3.compose(state.current, relative)
        index = vm.build_search_index(state.keyframe)

        if icp_on:
            def do_icp(_):
                res = align_fn(state.keyframe, match_ds.xyz, match_ds.valid, guess, index)
                ok = se3.rotation_within_threshold(
                    se3.quat_mul(res.pose.q, se3.quat_conj(state.current.q)),
                    cfg.angular_divergence_threshold)
                pose = jax.tree.map(lambda x, y: jnp.where(ok, x, y), res.pose, guess)
                return pose, res.iterations, res.step_norm, res.num_matches, ~ok

            def skip_icp(_):
                return (state.current, jnp.int32(0), jnp.float32(0.0),
                        jnp.int32(0), jnp.asarray(False))

            pose, iters, step_norm, n_matches, diverged = jax.lax.cond(
                initialized, do_icp, skip_icp, None)
        else:
            pose = guess
            iters = jnp.int32(0); step_norm = jnp.float32(0.0)
            n_matches = jnp.int32(0); diverged = jnp.asarray(False)

        if map_on:
            upd_world = preprocess.transform_with_normals(update_ds, pose)
            keyframe = vm.map_update(
                state.keyframe, upd_world, pose.t,
                voxel_size=cfg.keyframe_voxel_size, radius=cfg.keyframe_cleanup_range,
                index=index)
        else:
            keyframe = state.keyframe

        new_state = OdometryState(keyframe=keyframe, current=pose, previous=previous)
        diag = StepDiagnostics(pose=pose, icp_iterations=iters, icp_step_norm=step_norm,
                               num_matches=n_matches, diverged=diverged,
                               num_planar=jnp.int32(0),
                               map_voxels=jnp.int32(0))
        return new_state, diag

    return step


def time_variant(name, step, state0, stacked, n_scans, reps=2):
    @jax.jit
    def run(state, scans):
        return jax.lax.scan(step, state, scans)

    state, diags = run(state0, stacked)
    _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
    times = []
    for rep in range(reps):
        jit_in = stacked._replace(xyz=stacked.xyz + np.float32(1e-4 * (rep + 1)))
        jit_in = jax.device_put(jit_in)
        _ = float(jnp.sum(jit_in.xyz))
        t0 = time.time()
        state, diags = run(state0, jit_in)
        _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
        times.append(time.time() - t0)
    ms = 1e3 * min(times) / n_scans
    print(f"{name:44s} {ms:9.2f} ms/scan  (iters last={int(diags.icp_iterations[-1])})",
          flush=True)
    return ms


def main():
    cfg = OdometryConfig()
    n_scans = 10
    print("devices:", jax.devices(), file=sys.stderr)
    drive = simulate_sequence(num_scans=n_scans, width=cfg.scan_width, seed=1, speed=5.0)
    scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                             cfg.max_raw_points) for s in drive.scans]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    stacked = jax.device_put(stacked)
    state0 = odometry.init_state(cfg)

    time_variant("full", make_step(cfg), state0, stacked, n_scans)
    time_variant("no icp", make_step(cfg, icp_on=False), state0, stacked, n_scans)
    time_variant("no map_update", make_step(cfg, map_on=False), state0, stacked, n_scans)
    time_variant("no icp, no map", make_step(cfg, icp_on=False, map_on=False),
                 state0, stacked, n_scans)
    time_variant("no pre (fake planar)", make_step(cfg, pre_on=False), state0, stacked, n_scans)
    time_variant("no downsample", make_step(cfg, ds_on=False), state0, stacked, n_scans)
    time_variant("icp 1 outer", make_step(cfg, n_outer=1), state0, stacked, n_scans)
    time_variant("icp 8 outer", make_step(cfg, n_outer=8), state0, stacked, n_scans)


if __name__ == "__main__":
    main()
