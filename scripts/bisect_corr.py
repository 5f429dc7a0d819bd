"""Bisect find_correspondences cost on TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:40s} {1e3*(time.perf_counter()-t0)/n:9.2f} ms", flush=True)


def main():
    cfg = OdometryConfig()
    rng = np.random.default_rng(0)
    # build a realistic map: ~60k voxels
    pts = rng.uniform(-60, 60, (120000, 3)).astype(np.float32)
    nrm = rng.normal(size=(120000, 3)).astype(np.float32)
    cap = 131072
    pn = PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([pts, np.zeros((cap - len(pts), 3), np.float32)])),
        normal=jnp.asarray(np.concatenate([nrm, np.zeros((cap - len(pts), 3), np.float32)])),
        valid=jnp.asarray(np.arange(cap) < len(pts)),
    )
    m = vm.map_init(cfg.map_capacity, cfg.keyframe_max_points_cnt)
    m = vm.map_insert(m, pn, voxel_size=cfg.keyframe_voxel_size)
    q = jnp.asarray(rng.uniform(-60, 60, (cfg.max_match_points, 3)), np.float32)
    valid = jnp.ones(cfg.max_match_points, bool)
    C, K = m.capacity, m.max_points
    print("map voxels:", int(vm.map_size(m)), flush=True)

    vs, md = cfg.keyframe_voxel_size, cfg.icp_max_correspondence_distance

    def stage1(m, q, valid):
        base_idx = vm.voxel_indices(q, vs)
        nb_idx = base_idx[:, None, :] + vm._NEIGHBOR_OFFSETS[None, :, :]
        nb_keys = vm.pack_keys(nb_idx, m.origin, valid[:, None])
        pos = jnp.searchsorted(m.keys, nb_keys.reshape(-1)).astype(jnp.int32)
        return jnp.sum(pos)

    def stage2(m, q, valid):
        base_idx = vm.voxel_indices(q, vs)
        nb_idx = base_idx[:, None, :] + vm._NEIGHBOR_OFFSETS[None, :, :]
        nb_keys = vm.pack_keys(nb_idx, m.origin, valid[:, None])
        pos = jnp.searchsorted(m.keys, nb_keys.reshape(-1)).astype(jnp.int32)
        pos = jnp.minimum(pos, C - 1).reshape(nb_keys.shape)
        cand_pts = m.pts[pos]
        cand_nrm = m.nrm[pos]
        return jnp.sum(cand_pts) + jnp.sum(cand_nrm)

    def stage3(m, q, valid):
        base_idx = vm.voxel_indices(q, vs)
        nb_idx = base_idx[:, None, :] + vm._NEIGHBOR_OFFSETS[None, :, :]
        nb_keys = vm.pack_keys(nb_idx, m.origin, valid[:, None])
        pos = jnp.searchsorted(m.keys, nb_keys.reshape(-1)).astype(jnp.int32)
        pos = jnp.minimum(pos, C - 1).reshape(nb_keys.shape)
        hit = (m.keys[pos] == nb_keys) & (nb_keys != vm.EMPTY_KEY)
        cand_pts = m.pts[pos]
        cand_ok = hit[..., None] & (jnp.arange(K)[None, None, :] < m.count[pos][..., None])
        d2 = jnp.sum((cand_pts - q[:, None, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_ok & (d2 < md * md), d2, jnp.inf)
        flat = d2.reshape(d2.shape[0], -1)
        best = jnp.argmin(flat, axis=-1)
        return jnp.sum(best)

    def full(m, q, valid):
        c = vm.find_correspondences(m, q, valid, jnp.zeros(3), jnp.eye(3),
                                    voxel_size=vs, max_distance=md)
        return jnp.sum(c.plane_origin) + jnp.sum(c.valid)

    timeit("stage1 pack+searchsorted", jax.jit(stage1), m, q, valid)
    timeit("stage2 +gather rows", jax.jit(stage2), m, q, valid)
    timeit("stage3 +d2+argmin", jax.jit(stage3), m, q, valid)
    timeit("full find_correspondences", jax.jit(full), m, q, valid)

    # variant: flat-index gather instead of (Q,27) fancy index
    def stage2b(m, q, valid):
        base_idx = vm.voxel_indices(q, vs)
        nb_idx = base_idx[:, None, :] + vm._NEIGHBOR_OFFSETS[None, :, :]
        nb_keys = vm.pack_keys(nb_idx, m.origin, valid[:, None])
        pos = jnp.searchsorted(m.keys, nb_keys.reshape(-1)).astype(jnp.int32)
        pos = jnp.minimum(pos, C - 1)
        cand_pts = m.pts.reshape(C, -1)[pos]  # (Q*27, K*3)
        cand_nrm = m.nrm.reshape(C, -1)[pos]
        return jnp.sum(cand_pts) + jnp.sum(cand_nrm)

    timeit("stage2b gather (C, K*3) flat idx", jax.jit(stage2b), m, q, valid)

    # variant: d2 via dot trick (|p|^2 - 2 q.p + |q|^2) using matmul-ish ops
    def stage3b(m, q, valid):
        base_idx = vm.voxel_indices(q, vs)
        nb_idx = base_idx[:, None, :] + vm._NEIGHBOR_OFFSETS[None, :, :]
        nb_keys = vm.pack_keys(nb_idx, m.origin, valid[:, None])
        pos = jnp.searchsorted(m.keys, nb_keys.reshape(-1)).astype(jnp.int32)
        pos = jnp.minimum(pos, C - 1).reshape(nb_keys.shape)
        cand = m.pts[pos]  # (Q,27,K,3)
        qq = q[:, None, None, :]
        d2 = (
            jnp.sum(cand * cand, -1)
            - 2.0 * jnp.einsum("qnkd,qd->qnk", cand, q)
            + jnp.sum(q * q, -1)[:, None, None]
        )
        return jnp.sum(d2)

    timeit("stage3b einsum d2", jax.jit(stage3b), m, q, valid)


if __name__ == "__main__":
    main()
