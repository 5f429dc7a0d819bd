"""Internal ablation of map_update on realistic state.

Each variant runs the insert body with pieces disabled, in an N-iteration
fori_loop with per-iteration input jitter (defeats CSE/hoisting), single
lane and vmapped.

Usage: python scripts/profile_map_update.py [B]
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
from lidar_odometry_demo_tpu.ops import classifier, preprocess, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

B = int(sys.argv[1]) if len(sys.argv) > 1 else 0
N = 20
cfg = OdometryConfig()
drive = simulate_sequence(num_scans=11, width=cfg.scan_width, seed=1, speed=5.0)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[:10])
run = odometry.make_sequence_runner(cfg)
state, _ = run(odometry.init_state(cfg), stacked)
jax.block_until_ready(state)
m = state.keyframe
raw = scans[10]
scan = preprocess.time_normalize(raw)
relative = se3.relative_to(state.previous, state.current)
deskewed = preprocess.deskew(scan, se3.inverse(relative), se3.Pose.identity())
planar, _, _ = classifier.classify(deskewed, cfg)
planar = preprocess.range_filter(planar, cfg.lidar_min_range, cfg.lidar_max_range)
update_ds = vm.downsample(planar, voxel_size=cfg.keyframe_update_voxel_size,
                          budget=cfg.max_update_points)
guess = se3.compose(state.current, relative)
upd_world = preprocess.transform_with_normals(update_ds, guess)
index = vm.build_search_index(m)
center = guess.t
voxel_size, radius = cfg.keyframe_voxel_size, cfg.keyframe_cleanup_range
C, K = m.capacity, m.max_points
EMPTY = vm.EMPTY_KEY


def update_variant(mode):
    """Reimplementation of map_update with stages toggled."""
    use_index = "noindex" not in mode

    def f(m, new, center, index):
        new_origin = vm.voxel_indices(center, voxel_size)
        shift = vm._shift_key(new_origin - m.origin)
        occupied = m.keys != EMPTY
        keys1 = jnp.where(occupied, m.keys - shift, EMPTY)
        d2 = jnp.sum((m.anchor - center) ** 2, axis=-1)
        evict = occupied & (d2 > radius * radius)
        count1 = jnp.where(evict, 0, m.count)

        keys = vm.pack_keys(vm.voxel_indices(new.xyz, voxel_size), new_origin, new.valid)
        order = jnp.argsort(keys, stable=True)
        skeys = keys[order]
        sxyz = new.xyz[order]
        snrm = new.normal[order]
        if "sortonly" in mode:
            return jnp.sum(skeys) + jnp.sum(sxyz)
        leader, rank, start = vm._group_structure(skeys)
        valid_e = skeys != EMPTY
        if use_index:
            pos_c, found = vm._directory_lookup(m, index, sxyz, valid_e, voxel_size)
            found = found & (keys1[pos_c] == skeys)
        else:
            pos = jnp.searchsorted(keys1, skeys).astype(jnp.int32)
            pos_c = jnp.minimum(pos, C - 1)
            found = valid_e & (keys1[pos_c] == skeys)
        if "lookuponly" in mode:
            return jnp.sum(pos_c) + jnp.sum(found)

        n_used = jnp.sum((keys1 != EMPTY).astype(jnp.int32))
        missing_leader = leader & ~found
        fresh_idx = jnp.cumsum(missing_leader.astype(jnp.int32)) - 1
        fresh_slot = n_used + fresh_idx
        free_rows = jnp.argsort(m.occ, stable=True).astype(jnp.int32)
        fresh_phys = free_rows[jnp.minimum(fresh_idx, C - 1)]
        slot = jnp.where(found, pos_c, fresh_slot)[start]
        phys = jnp.where(found, m.row[pos_c], fresh_phys)[start]
        base = jnp.where(found, count1[pos_c], 0)[start]
        write_idx = base + rank
        keep = valid_e & (write_idx < K) & (slot < C) & (slot >= 0)
        if "noscatter" not in mode:
            phys_w = jnp.where(keep, phys, C)
            widx_w = jnp.where(keep, write_idx, 0)
            pts2 = m.pts.at[phys_w, widx_w].set(sxyz, mode="drop")
            nrm2 = m.nrm.at[phys_w, widx_w].set(snrm, mode="drop")
        else:
            pts2, nrm2 = m.pts, m.nrm
        n = len(keep)
        prev_key = jnp.concatenate([jnp.array([EMPTY], skeys.dtype), skeys[:-1]])
        boundary = jnp.concatenate([jnp.array([True]), (skeys != prev_key)[1:]])
        nxt = jax.lax.associative_scan(
            jnp.minimum, jnp.where(boundary, jnp.arange(n, dtype=jnp.int32), n),
            reverse=True)
        nxt_strict = jnp.concatenate([nxt[1:], jnp.array([n], jnp.int32)])
        group_size = jnp.where(leader, nxt_strict - jnp.arange(n, dtype=jnp.int32), 0)
        new_count = jnp.minimum(K, base + group_size)
        slot_ok = leader & (slot < C) & (slot >= 0)
        cnt_slot = jnp.where(slot_ok, slot, C)
        count2 = count1.at[cnt_slot].set(jnp.where(leader, new_count, 0), mode="drop")
        key_slot = jnp.where(missing_leader & (slot < C), slot, C)
        keys2 = keys1.at[key_slot].set(skeys, mode="drop")
        row2 = m.row.at[key_slot].set(phys, mode="drop")
        anchor_slot = jnp.where(slot_ok & (base == 0), slot, C)
        anchor2 = m.anchor.at[anchor_slot].set(sxyz, mode="drop")
        occ2 = m.occ.at[jnp.where(missing_leader & (slot < C), phys, C)].set(
            True, mode="drop")
        tomb = (keys2 != EMPTY) & (count2 == 0)
        keys2 = jnp.where(tomb, EMPTY, keys2)
        occ2 = occ2.at[jnp.where(tomb, row2, C)].set(False, mode="drop")
        if "nosort" in mode:
            return (jnp.sum(keys2) + jnp.sum(count2) + jnp.sum(pts2[0, 0])
                    + jnp.sum(anchor2[0]))
        perm = jnp.argsort(keys2)
        return (jnp.sum(keys2[perm]) + jnp.sum(count2[perm]) + jnp.sum(row2[perm])
                + jnp.sum(anchor2[perm]) + jnp.sum(pts2[0, 0]) + jnp.sum(nrm2[0, 0])
                + jnp.sum(occ2))
    return f


def bench(name, fn, reps=2):
    lanes = max(B, 1)
    if B:
        args = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B, *x.shape)).copy(),
                            (m, upd_world, center, index))
        inner = jax.vmap(fn)
    else:
        args = (m, upd_world, center, index)
        inner = fn

    @jax.jit
    def run(mm, nw, c, ix):
        def step(i, acc):
            nw2 = nw._replace(xyz=nw.xyz + (i.astype(jnp.float32) * 1e-7))
            return acc + jnp.sum(inner(mm, nw2, c, ix))
        return jax.lax.fori_loop(0, N, step, jnp.float32(0.0))

    r = run(*args); _ = float(r)
    ts = []
    for _ in range(reps):
        t0 = time.time(); r = run(*args); _ = float(r); ts.append(time.time() - t0)
    print(f"{name:36s} {1e3*min(ts)/N/lanes:8.3f} ms/lane", flush=True)


print(f"B={B or 1} voxels={int(vm.map_size(m))}", file=sys.stderr)
bench("full (directory lookup)", update_variant("index"))
bench("full (searchsorted)", update_variant("noindex"))
bench("sort new keys only", update_variant("index+sortonly"))
bench("..+lookup only (directory)", update_variant("index+lookuponly"))
bench("..+lookup only (searchsorted)", update_variant("noindex+lookuponly"))
bench("full minus payload scatter", update_variant("index+noscatter"))
bench("full minus final sort+permute", update_variant("index+nosort"))
