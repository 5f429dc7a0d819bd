"""Which pipeline piece degrades the device (int32 build)?

Runs pieces in order, timing a probe searchsorted after each.
"""

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

_rng = np.random.default_rng(1)
_keys = None
_q = None
_ss = None


def probe(tag, n=5):
    global _keys, _q, _ss
    if _keys is None:
        _keys = jnp.sort(jnp.asarray(_rng.integers(0, 2**31 - 1, 131072), jnp.int32))
        _q = jnp.asarray(_rng.integers(0, 2**31 - 1, 8192 * 27), jnp.int32)
        _ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    out = _ss(_keys, _q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [_ss(_keys, _q) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"probe after {tag:28s} {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    cfg = OdometryConfig()
    probe("START")

    drive = simulate_sequence(num_scans=2, width=cfg.scan_width, seed=1, speed=5.0)
    scan = scan_from_numpy(
        drive.scans[0]["xyz"], drive.scans[0]["intensity"],
        drive.scans[0]["ring"], drive.scans[0]["time"], cfg.max_raw_points,
    )
    probe("data setup")

    scan_n = jax.jit(preprocess.time_normalize)(scan)
    jax.block_until_ready(scan_n)
    probe("time_normalize")

    dsk = jax.jit(lambda s: preprocess.deskew(s, se3.Pose.identity(), se3.Pose.identity()))(scan_n)
    jax.block_until_ready(dsk)
    probe("deskew")

    planar, org, curv = jax.jit(lambda s: classifier.classify(s, cfg))(dsk)
    jax.block_until_ready(planar)
    probe("classify")

    planar = jax.jit(lambda p: preprocess.range_filter(p, 4.0, 80.0))(planar)
    jax.block_until_ready(planar)
    probe("range_filter")

    upd = vm.downsample(planar, voxel_size=cfg.keyframe_update_voxel_size, budget=cfg.max_update_points)
    jax.block_until_ready(upd)
    probe("downsample")

    m = vm.map_init(cfg.map_capacity, cfg.keyframe_max_points_cnt)
    jax.block_until_ready(m)
    probe("map_init")

    sz = jax.jit(vm.map_size)(m)
    jax.block_until_ready(sz)
    probe("map_size")

    m = vm.map_insert(m, upd, voxel_size=cfg.keyframe_voxel_size)
    jax.block_until_ready(m)
    probe("map_insert")

    m2 = vm.radius_cleanup(m, jnp.zeros(3), radius=80.0, voxel_size=cfg.keyframe_voxel_size)
    jax.block_until_ready(m2)
    probe("radius_cleanup")

    match = vm.downsample(planar, voxel_size=cfg.keyframe_matching_voxel_size, budget=cfg.max_match_points)
    corr = vm.find_correspondences(m2, match.xyz, match.valid, jnp.zeros(3), jnp.eye(3),
                                   voxel_size=cfg.keyframe_voxel_size, max_distance=0.3)
    jax.block_until_ready(corr)
    probe("find_correspondences")

    res = icp.align(m2, match.xyz, match.valid, se3.Pose.identity(), cfg)
    jax.block_until_ready(res)
    probe("align")

    step = jax.jit(odometry.make_process_scan(cfg))
    state = odometry.init_state(cfg)
    state, diag = step(state, scan)
    jax.block_until_ready(state)
    probe("full step")


if __name__ == "__main__":
    main()
