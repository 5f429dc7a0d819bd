"""Bisect INSIDE map_insert: which fragment degrades gathers?

Run one variant per process: python scripts/degrade_inner.py <variant>
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals


def t_ss(tag, n=10):
    rng = np.random.default_rng(1)
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, 131072), jnp.uint32))
    q = jnp.asarray(rng.integers(0, 2**31, 8192 * 27), jnp.uint32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    out = ss(keys, q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [ss(keys, q) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"[{tag}] searchsorted: {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    variant = sys.argv[1]
    cfg = OdometryConfig()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, (120000, 3)).astype(np.float32)
    cap = 131072
    new = PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([pts, np.zeros((cap - len(pts), 3), np.float32)])),
        normal=jnp.zeros((cap, 3), jnp.float32),
        valid=jnp.asarray(np.arange(cap) < len(pts)),
    )
    m = vm.map_init(cfg.map_capacity, cfg.keyframe_max_points_cnt)
    voxel_size = cfg.keyframe_voxel_size
    C, K = m.capacity, m.max_points

    def fragment(m, new, upto):
        keys = vm.pack_keys(vm.voxel_indices(new.xyz, voxel_size), m.origin, new.valid)
        if upto == "pack":
            return jnp.sum(keys)
        order = jnp.argsort(keys, stable=True)
        skeys = keys[order]
        sxyz = new.xyz[order]
        snrm = new.normal[order]
        if upto == "sort":
            return jnp.sum(skeys) + jnp.sum(sxyz)
        leader, rank, start = vm._group_structure(skeys)
        valid_e = skeys != vm.EMPTY_KEY
        pos = jnp.searchsorted(m.keys, skeys).astype(jnp.int32)
        pos_c = jnp.minimum(pos, C - 1)
        found = valid_e & (m.keys[pos_c] == skeys)
        if upto == "lookup":
            return jnp.sum(pos_c) + jnp.sum(found)
        n_used = vm.map_size(m)
        missing_leader = leader & ~found
        fresh_idx = jnp.cumsum(missing_leader.astype(jnp.int32)) - 1
        fresh_slot = n_used + fresh_idx
        slot_at_pos = jnp.where(found, pos_c, fresh_slot)
        slot = slot_at_pos[start]
        existing_cnt = jnp.where(found, m.count[pos_c], 0)
        base = existing_cnt[start]
        write_idx = base + rank
        keep = valid_e & (write_idx < K) & (slot < C) & (slot >= 0)
        slot_w = jnp.where(keep, slot, C)
        pts2 = m.pts.at[slot_w, jnp.where(keep, write_idx, 0)].set(sxyz, mode="drop")
        nrm2 = m.nrm.at[slot_w, jnp.where(keep, write_idx, 0)].set(snrm, mode="drop")
        if upto == "scatter":
            return jnp.sum(pts2) + jnp.sum(nrm2)
        nn = len(keep)
        prev_key = jnp.concatenate([jnp.array([vm.EMPTY_KEY], skeys.dtype), skeys[:-1]])
        boundary = jnp.concatenate([jnp.array([True]), (skeys != prev_key)[1:]])
        nxt = jax.lax.associative_scan(
            jnp.minimum, jnp.where(boundary, jnp.arange(nn, dtype=jnp.int32), nn), reverse=True)
        nxt_strict = jnp.concatenate([nxt[1:], jnp.array([nn], jnp.int32)])
        group_size = jnp.where(leader, nxt_strict - jnp.arange(nn, dtype=jnp.int32), 0)
        new_count = jnp.minimum(K, base + group_size)
        cnt_slot = jnp.where(leader & (slot < C) & (slot >= 0), slot, C)
        count2 = m.count.at[cnt_slot].set(jnp.where(leader, new_count, 0), mode="drop")
        key_slot = jnp.where(missing_leader & (slot < C), slot, C)
        keys2 = m.keys.at[key_slot].set(skeys, mode="drop")
        if upto == "counts":
            return jnp.sum(count2) + jnp.sum(keys2)
        perm = jnp.argsort(keys2)
        out = vm.VoxelMap(keys2[perm], count2[perm], pts2[perm], nrm2[perm], m.origin)
        return jnp.sum(out.keys) + jnp.sum(out.pts)

    if variant != "none":
        f = jax.jit(lambda m, n_: fragment(m, n_, variant))
        out = f(m, new)
        jax.block_until_ready(out)
        print(f"ran fragment '{variant}'", flush=True)
    t_ss(variant)


if __name__ == "__main__":
    main()
