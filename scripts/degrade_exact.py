"""Exact-trigger hunt: is it the big pytree args? python ... <variant>"""

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
    vs = cfg.keyframe_voxel_size

    if variant == "exact":
        f = jax.jit(lambda mm, nn: jnp.sum(
            vm.pack_keys(vm.voxel_indices(nn.xyz, vs), mm.origin, nn.valid)))
        out = f(m, new)
    elif variant == "nomap":
        f = jax.jit(lambda org, nn: jnp.sum(
            vm.pack_keys(vm.voxel_indices(nn.xyz, vs), org, nn.valid)))
        out = f(m.origin, new)
    elif variant == "sumonly":
        f = jax.jit(lambda mm, nn: jnp.sum(nn.xyz))
        out = f(m, new)
    elif variant == "bigarg":
        big = jnp.zeros((2, 131072, 20, 3), jnp.float32)
        f = jax.jit(lambda b, x: jnp.sum(x))
        out = f(big, new.xyz)
    elif variant == "mapsize":
        f = jax.jit(lambda mm: vm.map_size(mm))
        out = f(m)
    elif variant == "none":
        out = jnp.zeros(())
    else:
        raise ValueError(variant)
    jax.block_until_ready(out)
    print("ran", variant, flush=True)
    t_ss(variant)


if __name__ == "__main__":
    main()
