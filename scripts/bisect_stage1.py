"""What inside pack+searchsorted costs 30 ms on TPU?"""

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
    print(f"{name:44s} {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    cfg = OdometryConfig()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, (120000, 3)).astype(np.float32)
    cap = 131072
    pn = PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([pts, np.zeros((cap - len(pts), 3), np.float32)])),
        normal=jnp.zeros((cap, 3), jnp.float32),
        valid=jnp.asarray(np.arange(cap) < len(pts)),
    )
    m = vm.map_init(cfg.map_capacity, cfg.keyframe_max_points_cnt)
    m = vm.map_insert(m, pn, voxel_size=cfg.keyframe_voxel_size)
    q = jnp.asarray(rng.uniform(-60, 60, (cfg.max_match_points, 3)), np.float32)
    valid = jnp.ones(cfg.max_match_points, bool)
    vs = cfg.keyframe_voxel_size

    def pack_only(q, origin, valid):
        base_idx = vm.voxel_indices(q, vs)
        nb_idx = base_idx[:, None, :] + vm._NEIGHBOR_OFFSETS[None, :, :]
        return vm.pack_keys(nb_idx, origin, valid[:, None])

    nb_keys = jax.jit(pack_only)(q, m.origin, valid)
    jax.block_until_ready(nb_keys)
    flat_keys = nb_keys.reshape(-1)

    timeit("pack only", jax.jit(pack_only), q, m.origin, valid)
    timeit("searchsorted(flat pre-made)", jax.jit(lambda k, x: jnp.searchsorted(k, x)), m.keys, flat_keys)
    timeit("searchsorted sum", jax.jit(lambda k, x: jnp.sum(jnp.searchsorted(k, x))), m.keys, flat_keys)

    # identical to micro benchmark for reference
    rkeys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, cap), jnp.uint32))
    rq = jnp.asarray(rng.integers(0, 2**31, flat_keys.shape[0]), jnp.uint32)
    timeit("searchsorted random (micro repro)", jax.jit(lambda k, x: jnp.searchsorted(k, x)), rkeys, rq)

    # method variants
    for method in ("scan", "scan_unrolled", "compare_all"):
        try:
            timeit(f"searchsorted method={method}",
                   jax.jit(lambda k, x, mm=method: jnp.searchsorted(k, x, method=mm)),
                   m.keys, flat_keys)
        except Exception as e:
            print(method, "failed:", e, flush=True)

    # manual vectorized binary search
    def manual_bs(keys, x):
        n = keys.shape[0]
        lo = jnp.zeros(x.shape, jnp.int32)
        hi = jnp.full(x.shape, n, jnp.int32)
        for _ in range(17):
            mid = (lo + hi) // 2
            less = keys[jnp.minimum(mid, n - 1)] < x
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        return lo

    timeit("manual binary search (unrolled 17)", jax.jit(manual_bs), m.keys, flat_keys)

    # pack + searchsorted together (the original stage1)
    def stage1(q, origin, valid, keys):
        nb = pack_only(q, origin, valid)
        return jnp.searchsorted(keys, nb.reshape(-1))

    timeit("pack + searchsorted fused", jax.jit(stage1), q, m.origin, valid, m.keys)


if __name__ == "__main__":
    main()
