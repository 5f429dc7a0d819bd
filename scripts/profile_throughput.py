"""Throughput-style timing (block only at end): isolates device time from
tunnel RPC latency."""

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


def _force(x):
    """Completion barrier: fetch a scalar (block_until_ready can return
    early on the axon runtime)."""
    leaves = jax.tree.leaves(x)
    return sum(float(jnp.sum(l.astype(jnp.float32))) for l in leaves if hasattr(l, "dtype"))


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    _force(outs[-1])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {1e3*dt:9.2f} ms/call (throughput, n={n})", flush=True)
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
    for sc in scans[:2]:
        state, diag = step(state, sc)
    jax.block_until_ready(state)
    print("warmup diag: iters", int(diag.icp_iterations), "matches", int(diag.num_matches), flush=True)

    timeit("full step", step, state, scans[2], n=10)

    planar0, _, _ = jax.jit(lambda s: classifier.classify(s, cfg))(scans[2])
    planar = preprocess.range_filter(planar0, cfg.lidar_min_range, cfg.lidar_max_range)
    match = vm.downsample(planar, voxel_size=cfg.keyframe_matching_voxel_size, budget=cfg.max_match_points)
    jax.block_until_ready(match)

    al = jax.jit(icp.make_align(cfg))
    timeit("align", al, state.keyframe, match.xyz, match.valid, state.current, n=10)

    fc = jax.jit(lambda m, x, v: vm.find_correspondences(
        m, x, v, jnp.zeros(3), jnp.eye(3), voxel_size=cfg.keyframe_voxel_size,
        max_distance=cfg.icp_max_correspondence_distance))
    corr = timeit("find_correspondences", fc, state.keyframe, match.xyz, match.valid)

    gn = jax.jit(lambda c, g: icp._gn_steps(c, g, g.t, cfg))
    timeit("gn_steps (4 inner)", gn, corr, se3.Pose.identity())

    rc = jax.jit(lambda m, c: vm.radius_cleanup(m, c, radius=cfg.keyframe_cleanup_range,
                                                voxel_size=cfg.keyframe_voxel_size))
    timeit("radius_cleanup", rc, state.keyframe, jnp.zeros(3))

    upd = vm.downsample(planar, voxel_size=cfg.keyframe_update_voxel_size, budget=cfg.max_update_points)
    mi = jax.jit(lambda m, p: vm.map_insert(m, p, voxel_size=cfg.keyframe_voxel_size))
    timeit("map_insert", mi, state.keyframe, upd)

    ds = jax.jit(lambda p: vm.downsample(p, voxel_size=cfg.keyframe_update_voxel_size, budget=cfg.max_update_points))
    timeit("downsample 0.1", ds, planar)

    cls = jax.jit(lambda s: classifier.classify(s, cfg))
    timeit("classify", cls, scans[2])

    dsk = jax.jit(lambda s: preprocess.deskew(preprocess.time_normalize(s), se3.Pose.identity(), se3.Pose.identity()))
    timeit("normalize+deskew", dsk, scans[2])

    # how many align iterations happen across a short drive?
    drive2 = simulate_sequence(num_scans=10, width=cfg.scan_width, seed=42, speed=5.0, yaw_rate=0.08)
    st = odometry.init_state(cfg)
    iters = []
    for s in drive2.scans:
        sc = scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
        st, dg = step(st, sc)
        iters.append(int(dg.icp_iterations))
    print("align iterations per scan over drive:", iters, flush=True)


if __name__ == "__main__":
    main()
