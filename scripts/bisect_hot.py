"""Focused TPU timing of the hot ops. WARNING: numbers are UNRELIABLE
for loop-invariant benches — XLA CSE/hoisting computes fn(*args) ONCE
and the fori_loop degenerates to adds (discovered r4: build_search_index
"measured" 0.12 ms against a 2.1 ms trace truth). Only i-dependent
formulations (scripts/kernel_chip_check.py style) or xplane traces
(scripts/device_time_report.py) give honest per-op numbers; E2E truth is
bench.py. Kept for its warm-up/scaffold value.

Usage: python scripts/bisect_hot.py [iters=50]
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
from lidar_odometry_demo_tpu.ops import icp, preprocess, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def log(m):
    print(m, file=sys.stderr, flush=True)


cfg = OdometryConfig()
log("simulating...")
drive = simulate_sequence(num_scans=11, width=cfg.scan_width, seed=1, speed=5.0)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[:10])
run = odometry.make_sequence_runner(cfg)
log("warm compile+run...")
state, _ = run(odometry.init_state(cfg), stacked)
_ = float(jnp.sum(state.current.t))
log(f"warm done; map voxels {int(vm.map_size(state.keyframe))}")

raw = scans[10]
scan = preprocess.time_normalize(raw)
relative = se3.relative_to(state.previous, state.current)
deskewed = preprocess.deskew(scan, se3.inverse(relative), se3.Pose.identity())
planar, _, _ = __import__(
    "lidar_odometry_demo_tpu.ops.classifier", fromlist=["classify"]
).classify(deskewed, cfg)
planar = preprocess.range_filter(planar, cfg.lidar_min_range, cfg.lidar_max_range)
match_ds = vm.downsample(planar, voxel_size=cfg.keyframe_matching_voxel_size,
                         budget=cfg.max_match_points)
update_ds = vm.downsample(planar, voxel_size=cfg.keyframe_update_voxel_size,
                          budget=cfg.max_update_points)
guess = se3.compose(state.current, relative)
upd_world = preprocess.transform_with_normals(update_ds, guess)
m = state.keyframe
index = vm.build_search_index(m)
Rg = se3.quat_to_matrix(guess.q)
cand = vm.gather_candidates(m, index, match_ds.xyz, match_ds.valid, guess.t, Rg,
                            voxel_size=cfg.keyframe_voxel_size)


def bench(name, fn, *args, iters=N, reps=3):
    @jax.jit
    def loop(*a):
        def step(i, acc):
            out = fn(*a)
            return acc + jax.tree.reduce(
                lambda s, x: s + jnp.sum(
                    x[..., 0] if x.ndim else x).astype(jnp.float32),
                out, jnp.float32(0.0))
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    r = loop(*args); _ = float(r)
    ts = []
    for _i in range(reps):
        t0 = time.time(); r = loop(*args); _ = float(r)
        ts.append(time.time() - t0)
    # subtract the ~25 ms dispatch floor via the per-call overhead model
    ms = 1e3 * min(ts) / iters
    log(f"{name:34s} {ms:8.3f} ms (raw min incl {1e3*min(ts):.0f}/{iters} floor)")


bench("match_candidates", lambda mm, cd, q, v: vm.match_candidates(
    mm, cd, q, v, guess.t, Rg,
    max_distance=cfg.icp_max_correspondence_distance).plane_origin,
    m, cand, match_ds.xyz, match_ds.valid)
bench("build_search_index", lambda mm: vm.build_search_index(mm).desc, m)
bench("map_update (indexed)", lambda mm, ix, nw: vm.map_update(
    mm, nw, guess.t, voxel_size=cfg.keyframe_voxel_size,
    radius=cfg.keyframe_cleanup_range, index=ix).keys,
    m, index, upd_world, iters=20)
bench("gather_candidates (prebuilt)", lambda mm, ix, q, v: vm.gather_candidates(
    mm, ix, q, v, guess.t, Rg, voxel_size=cfg.keyframe_voxel_size).rows_z[1],
    m, index, match_ds.xyz, match_ds.valid)
align_fn = icp.make_align(cfg)
bench("full align", lambda mm, ix, q, v: align_fn(
    mm, q, v, guess, ix).pose.t, m, index, match_ds.xyz, match_ds.valid,
    iters=10)
log("done")
