"""Which ICP-solver construct triggers degradation? (value-fetch barriers)

python scripts/degrade_align.py <solve|gn|corr|align|cond|while|none>
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.ops import icp, se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals


def probe(tag, n=8):
    rng = np.random.default_rng(1)
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31 - 1, 131072), jnp.int32))
    q = jnp.asarray(rng.integers(0, 2**31 - 1, 8192 * 27), jnp.int32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    _ = int(ss(keys, q)[0])
    t0 = time.perf_counter()
    for i in range(n):
        _ = int(ss(keys, q + jnp.int32(i))[0])
    print(f"[{tag}] probe: {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    variant = sys.argv[1]
    cfg = OdometryConfig()
    rng = np.random.default_rng(0)

    if variant == "solve":
        H = jnp.asarray(rng.normal(size=(6, 6)), jnp.float32)
        H = H @ H.T + 1e-3 * jnp.eye(6)
        b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
        out = jax.jit(jnp.linalg.solve)(H, b)
        _ = float(out[0])
    elif variant == "cond":
        f = jax.jit(lambda p, x: jax.lax.cond(p, lambda _: x * 2, lambda _: x - 1, None))
        out = f(jnp.asarray(True), jnp.ones((1000,), jnp.float32))
        _ = float(out[0])
    elif variant == "while":
        def body(c):
            x, i = c
            return x * 1.0001, i + 1
        f = jax.jit(lambda x: jax.lax.while_loop(lambda c: c[1] < 10, body, (x, 0)))
        out = f(jnp.ones((1000,), jnp.float32))
        _ = float(out[0][0])
    else:
        pts = rng.uniform(-30, 30, (60000, 3)).astype(np.float32)
        nrm = rng.normal(size=(60000, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        cap = 65536
        pn = PointsWithNormals(
            xyz=jnp.asarray(np.concatenate([pts, np.zeros((cap - len(pts), 3), np.float32)])),
            normal=jnp.asarray(np.concatenate([nrm, np.zeros((cap - len(pts), 3), np.float32)])),
            valid=jnp.asarray(np.arange(cap) < len(pts)),
        )
        m = vm.map_init(cfg.map_capacity, cfg.keyframe_max_points_cnt)
        m = vm.map_insert(m, pn, voxel_size=cfg.keyframe_voxel_size)
        _ = int(vm.map_size(m))
        probe("setup(map built)")
        q = jnp.asarray(rng.uniform(-30, 30, (cfg.max_match_points, 3)), np.float32)
        valid = jnp.ones(cfg.max_match_points, bool)
        if variant == "corr":
            out = vm.find_correspondences(m, q, valid, jnp.zeros(3), jnp.eye(3),
                                          voxel_size=cfg.keyframe_voxel_size, max_distance=0.3)
            _ = float(out.plane_origin[0, 0])
        elif variant == "gn":
            corr = vm.find_correspondences(m, q, valid, jnp.zeros(3), jnp.eye(3),
                                           voxel_size=cfg.keyframe_voxel_size, max_distance=0.3)
            out = jax.jit(lambda c, g: icp._gn_steps(c, g, g.t, cfg))(corr, se3.Pose.identity())
            _ = float(out[0].t[0])
        elif variant == "align":
            out = icp.align(m, q, valid, se3.Pose.identity(), cfg)
            _ = float(out.pose.t[0])
        elif variant == "none":
            pass
        else:
            raise ValueError(variant)
    print("ran", variant, flush=True)
    probe(variant)


if __name__ == "__main__":
    main()
