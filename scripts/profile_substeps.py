"""Amortized sub-step timings of the odometry hot path on realistic state.

WARNING (r4 finding): the fori_loop bodies here are LOOP-INVARIANT, so
XLA CSE/hoisting can compute each sub-step ONCE and degenerate the loop
to adds — several numbers under-report badly (build_search_index read
0.12 ms against a 2.1 ms xplane-trace truth). Use
scripts/device_time_report.py (xplane) for honest per-op device times and
bench.py for E2E; i-dependent loops (scripts/kernel_chip_check.py style)
for micro A/Bs.

Usage: python scripts/profile_substeps.py [B]
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
from lidar_odometry_demo_tpu.ops import classifier, icp, preprocess, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

B = int(sys.argv[1]) if len(sys.argv) > 1 else 0  # 0 = single lane
N = 20

cfg = OdometryConfig()
drive = simulate_sequence(num_scans=11, width=cfg.scan_width, seed=1, speed=5.0)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[:10])
run = odometry.make_sequence_runner(cfg)
state, _ = run(odometry.init_state(cfg), stacked)
jax.block_until_ready(state)

# realistic per-scan inputs from scan 10
raw = scans[10]
scan = preprocess.time_normalize(raw)
relative = se3.relative_to(state.previous, state.current)
deskewed = preprocess.deskew(scan, se3.inverse(relative), se3.Pose.identity())
planar, _, _ = classifier.classify(deskewed, cfg)
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
print(f"map voxels: {int(vm.map_size(m))}", file=sys.stderr)


def maybe_batch(tree):
    if B == 0:
        return tree
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (B, *x.shape)).copy(), tree)


def bench(name, fn, *args, iters=N):
    args = tuple(maybe_batch(a) for a in args)
    inner = fn if B == 0 else jax.vmap(fn)

    @jax.jit
    def run(*a):
        def step(i, acc):
            out = inner(*a)
            return acc + jax.tree.reduce(
                lambda s, x: s + jnp.sum(x[..., 0] if x.ndim else x).astype(jnp.float32),
                out, jnp.float32(0.0))
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))

    r = run(*args); _ = float(r)
    ts = []
    for _ in range(2):
        t0 = time.time(); r = run(*args); _ = float(r); ts.append(time.time() - t0)
    lanes = max(B, 1)
    print(f"{name:40s} {1e3*min(ts)/iters/lanes:8.3f} ms/lane", flush=True)


print(f"B={B or 1}", file=sys.stderr)

# --- front-end ---
bench("time_norm+deskew", lambda r: preprocess.deskew(
    preprocess.time_normalize(r), se3.inverse(relative), se3.Pose.identity()).xyz,
    raw)
bench("classify", lambda d: classifier.classify(d, cfg)[0].xyz, deskewed)
bench("downsample match (8k)",
      lambda p: vm.downsample(p, voxel_size=cfg.keyframe_matching_voxel_size,
                              budget=cfg.max_match_points).xyz, planar)
bench("downsample update (16k)",
      lambda p: vm.downsample(p, voxel_size=cfg.keyframe_update_voxel_size,
                              budget=cfg.max_update_points).xyz, planar)

# --- search structures ---
bench("build_search_index", lambda mm: vm.build_search_index(mm).rows, m)
bench("  rows3 slice only", lambda t: jnp.concatenate(
    [t[0:cfg.map_capacity, :64],
     jnp.concatenate([t, jnp.zeros((2, t.shape[1]), jnp.int32)])[1:cfg.map_capacity+1, :64],
     jnp.concatenate([t, jnp.zeros((2, t.shape[1]), jnp.int32)])[2:cfg.map_capacity+2, :64]],
    axis=1), m.tab)
bench("gather_candidates",
      lambda mm, q, v: vm.gather_candidates(
          mm, vm.build_search_index(mm), q, v, guess.t, Rg,
          voxel_size=cfg.keyframe_voxel_size).rows_z[1],
      m, match_ds.xyz, match_ds.valid)
bench("gather_candidates (prebuilt index)",
      lambda mm, ix, q, v: vm.gather_candidates(
          mm, ix, q, v, guess.t, Rg,
          voxel_size=cfg.keyframe_voxel_size).rows_z[1],
      m, index, match_ds.xyz, match_ds.valid)
bench("match_candidates",
      lambda mm, cd, q, v: vm.match_candidates(
          mm, cd, q, v, guess.t, Rg,
          max_distance=cfg.icp_max_correspondence_distance).plane_origin,
      m, cand, match_ds.xyz, match_ds.valid)


def gn(mm, cd, q, v):
    corr = vm.match_candidates(mm, cd, q, v, guess.t, Rg,
                               max_distance=cfg.icp_max_correspondence_distance)
    pose, sn = icp._gn_steps(corr, guess, guess.t, cfg)
    return pose.t


bench("match + 4 GN steps", gn, m, cand, match_ds.xyz, match_ds.valid)

# --- full align (while loop, realistic exit) ---
align_fn = icp.make_align(cfg)
bench("full align (while loop)",
      lambda mm, ix, q, v: align_fn(mm, q, v, guess, ix).pose.t,
      m, index, match_ds.xyz, match_ds.valid, iters=5)

# --- map maintenance ---
bench("map_update (indexed)",
      lambda mm, ix, nw: vm.map_update(
          mm, nw, guess.t, voxel_size=cfg.keyframe_voxel_size,
          radius=cfg.keyframe_cleanup_range, index=ix).keys,
      m, index, upd_world)
bench("map_update (searchsorted)",
      lambda mm, nw: vm.map_update(
          mm, nw, guess.t, voxel_size=cfg.keyframe_voxel_size,
          radius=cfg.keyframe_cleanup_range).keys,
      m, upd_world)

# map_update internals at current shapes
new_keys = vm.pack_keys(vm.voxel_indices(upd_world.xyz, cfg.keyframe_voxel_size),
                        m.origin, upd_world.valid, map_window=True)
keys_ext = jnp.concatenate([m.keys, new_keys])
bench("  argsort new keys (16k)", lambda k: jnp.argsort(k, stable=True), new_keys)
bench("  argsort ext keys (C+16k)", lambda k: jnp.argsort(k), keys_ext)
tab_ext = jnp.concatenate(
    [m.tab, jnp.zeros((new_keys.shape[0], m.tab.shape[1]), jnp.int32)])
order = jnp.argsort(keys_ext)[: cfg.map_capacity]
bench("  C-row merge gather (W lanes)", lambda t, o: t[o], tab_ext, order)
# splice points derived from the live lane layout (count at 3K, key at MB)
_K = cfg.keyframe_max_points_cnt
_, _MB, _ = vm._lanes(_K)
bench("  meta rebuild concat", lambda t: jnp.concatenate(
    [t[:, : 3 * _K], t[:, 3 * _K : 3 * _K + 1], t[:, 3 * _K + 1 : _MB],
     t[:, _MB : _MB + 1], t[:, _MB + 1 :]], axis=1), m.tab)

# --- full steady-state step (state threaded through the loop) ---
step_fn = odometry.make_process_scan(cfg)


def full_step_loop(state0, r):
    def body(i, st):
        st2, _ = step_fn(st, r)
        return st2
    return jax.lax.fori_loop(0, N, body, state0).current.t


args = (state, raw)
if B:
    args = tuple(maybe_batch(a) for a in args)
    fsl = jax.jit(jax.vmap(full_step_loop))
else:
    fsl = jax.jit(full_step_loop)
r = fsl(*args); _ = float(jnp.sum(r))
ts = []
for _ in range(2):
    t0 = time.time(); r = fsl(*args); _ = float(jnp.sum(r)); ts.append(time.time() - t0)
print(f"{'FULL process_scan step':40s} {1e3*min(ts)/N/max(B,1):8.3f} ms/lane",
      flush=True)
