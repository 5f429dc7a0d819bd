"""Per-stage timing of the pipeline on the current backend."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops import classifier, icp, preprocess, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {1e3*dt:9.2f} ms")
    return out


def main():
    cfg = OdometryConfig()
    print("devices:", jax.devices(), file=sys.stderr)
    drive = simulate_sequence(num_scans=3, width=cfg.scan_width, seed=1, speed=5.0)
    scan = scan_from_numpy(
        drive.scans[0]["xyz"], drive.scans[0]["intensity"],
        drive.scans[0]["ring"], drive.scans[0]["time"], cfg.max_raw_points,
    )
    state = odometry.init_state(cfg)
    step = jax.jit(odometry.make_process_scan(cfg))
    # build a map from 2 scans
    for s in drive.scans[:2]:
        sc = scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
        state, _ = step(state, sc)
    jax.block_until_ready(state)

    timeit("full step", step, state, scan)

    tn = jax.jit(preprocess.time_normalize)
    scan_n = timeit("time_normalize", tn, scan)

    dsk = jax.jit(lambda s: preprocess.deskew(s, se3.Pose.identity(), se3.Pose.identity()))
    scan_d = timeit("deskew", dsk, scan_n)

    cls = jax.jit(lambda s: classifier.classify(s, cfg))
    planar, _, _ = timeit("classify", cls, scan_d)

    rf = jax.jit(lambda p: preprocess.range_filter(p, cfg.lidar_min_range, cfg.lidar_max_range))
    planar = timeit("range_filter", rf, planar)

    ds1 = jax.jit(lambda p: vm.downsample(p, voxel_size=cfg.keyframe_update_voxel_size, budget=cfg.max_update_points))
    upd = timeit("downsample 0.1", ds1, planar)

    ds2 = jax.jit(lambda p: vm.downsample(p, voxel_size=cfg.keyframe_matching_voxel_size, budget=cfg.max_match_points))
    match = timeit("downsample 0.3", ds2, planar)

    fc = jax.jit(lambda m, x, v, t, R: vm.find_correspondences(
        m, x, v, t, R, voxel_size=cfg.keyframe_voxel_size,
        max_distance=cfg.icp_max_correspondence_distance))
    corr = timeit("find_correspondences x1", fc, state.keyframe, match.xyz, match.valid,
                  jnp.zeros(3), jnp.eye(3))

    gn = jax.jit(lambda c, g: icp._gn_steps(c, g, g.t, cfg))
    timeit("gn_steps (4 inner) x1", gn, corr, se3.Pose.identity())

    al = jax.jit(icp.make_align(cfg))
    res = timeit("align (full ICP)", al, state.keyframe, match.xyz, match.valid, se3.Pose.identity())
    print("  align iters:", int(res.iterations), "matches:", int(res.num_matches))

    rc = jax.jit(lambda m, c: vm.radius_cleanup(m, c, radius=cfg.keyframe_cleanup_range,
                                                voxel_size=cfg.keyframe_voxel_size))
    timeit("radius_cleanup", rc, state.keyframe, jnp.zeros(3))

    twn = jax.jit(lambda p: preprocess.transform_with_normals(p, se3.Pose.identity()))
    updw = timeit("transform_with_normals", twn, upd)

    mi = jax.jit(lambda m, p: vm.map_insert(m, p, voxel_size=cfg.keyframe_voxel_size))
    timeit("map_insert", mi, state.keyframe, updw)


if __name__ == "__main__":
    main()
