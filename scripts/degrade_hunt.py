"""Find what process state makes searchsorted 100x slower."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:52s} {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    C, Q = 131072, 8192 * 27
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, C), jnp.uint32))
    q = jnp.asarray(rng.integers(0, 2**31, Q), jnp.uint32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))

    timeit("searchsorted FRESH process", ss, keys, q)

    # allocate some big buffers
    big = [jnp.zeros((131072, 20, 3), jnp.float32) for _ in range(4)]
    jax.block_until_ready(big)
    timeit("searchsorted after 60MB allocs", ss, keys, q)

    # run a big sort program (like map_insert does)
    srt = jax.jit(lambda x: jnp.argsort(x))
    p = srt(keys)
    jax.block_until_ready(p)
    timeit("searchsorted after argsort executable", ss, keys, q)

    # run map_insert itself
    from lidar_odometry_demo_tpu.config import OdometryConfig
    from lidar_odometry_demo_tpu.ops import voxel_map as vm
    from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

    cfg = OdometryConfig()
    pts = rng.uniform(-60, 60, (120000, 3)).astype(np.float32)
    cap = 131072
    pn = PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([pts, np.zeros((cap - len(pts), 3), np.float32)])),
        normal=jnp.zeros((cap, 3), jnp.float32),
        valid=jnp.asarray(np.arange(cap) < len(pts)),
    )
    m = vm.map_init(cfg.map_capacity, cfg.keyframe_max_points_cnt)
    m = vm.map_insert(m, pn, voxel_size=cfg.keyframe_voxel_size)
    jax.block_until_ready(m)
    timeit("searchsorted after map_insert", ss, keys, q)
    timeit("searchsorted on m.keys", ss, m.keys, q)

    del big, m, p
    timeit("searchsorted after del big buffers", ss, keys, q)


if __name__ == "__main__":
    main()
