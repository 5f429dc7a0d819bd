"""Focused TPU timing: full step, align, correspondences, map maintenance."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops import icp, preprocess, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry


def timeit(name, fn, *args, n=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} compile+1st {time.perf_counter()-t0:7.1f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {1e3*dt:9.2f} ms", flush=True)
    return out


def main():
    cfg = OdometryConfig()
    drive = simulate_sequence(num_scans=3, width=cfg.scan_width, seed=1, speed=5.0)
    state = odometry.init_state(cfg)
    step = jax.jit(odometry.make_process_scan(cfg))
    scans = [
        scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
        for s in drive.scans
    ]
    t0 = time.perf_counter()
    for sc in scans[:2]:
        state, diag = step(state, sc)
    jax.block_until_ready(state)
    print(f"step compile+2 runs: {time.perf_counter()-t0:.1f} s", flush=True)
    print("last diag: iters", int(diag.icp_iterations), "matches", int(diag.num_matches), flush=True)

    timeit("full step", step, state, scans[2])

    # pieces
    planar0, _, _ = jax.jit(lambda s: __import__('lidar_odometry_demo_tpu.ops.classifier', fromlist=['classify']).classify(s, cfg))(scans[2])
    planar = preprocess.range_filter(planar0, cfg.lidar_min_range, cfg.lidar_max_range)
    match = vm.downsample(planar, voxel_size=cfg.keyframe_matching_voxel_size, budget=cfg.max_match_points)
    jax.block_until_ready(match)

    al = jax.jit(icp.make_align(cfg))
    res = timeit("align", al, state.keyframe, match.xyz, match.valid, state.current)
    print("align iters:", int(res.iterations), "matches:", int(res.num_matches), flush=True)

    fc = jax.jit(lambda m, x, v: vm.find_correspondences(
        m, x, v, jnp.zeros(3), jnp.eye(3), voxel_size=cfg.keyframe_voxel_size,
        max_distance=cfg.icp_max_correspondence_distance))
    timeit("find_correspondences x1", fc, state.keyframe, match.xyz, match.valid)

    rc = jax.jit(lambda m, c: vm.radius_cleanup(m, c, radius=cfg.keyframe_cleanup_range,
                                                voxel_size=cfg.keyframe_voxel_size))
    timeit("radius_cleanup", rc, state.keyframe, jnp.zeros(3))

    upd = vm.downsample(planar, voxel_size=cfg.keyframe_update_voxel_size, budget=cfg.max_update_points)
    mi = jax.jit(lambda m, p: vm.map_insert(m, p, voxel_size=cfg.keyframe_voxel_size))
    timeit("map_insert", mi, state.keyframe, upd)

    ds = jax.jit(lambda p: vm.downsample(p, voxel_size=cfg.keyframe_update_voxel_size, budget=cfg.max_update_points))
    timeit("downsample 0.1", ds, planar)

    cls = jax.jit(lambda s: __import__('lidar_odometry_demo_tpu.ops.classifier', fromlist=['classify']).classify(s, cfg))
    timeit("classify", cls, scans[2])

    dsk = jax.jit(lambda s: preprocess.deskew(preprocess.time_normalize(s), se3.Pose.identity(), se3.Pose.identity()))
    timeit("normalize+deskew", dsk, scans[2])


if __name__ == "__main__":
    main()
