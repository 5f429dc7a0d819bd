"""Is searchsorted fast in-program, or were dispatch-level measurements lying?

python scripts/degrade_inprogram.py <fresh|triggered>
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    variant = sys.argv[1]
    rng = np.random.default_rng(1)
    C, Q = 131072, 8192 * 27
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, C), jnp.uint32))
    q = jnp.asarray(rng.integers(0, 2**31 - 64, Q), jnp.uint32)

    if variant == "triggered":
        from lidar_odometry_demo_tpu.ops import voxel_map as vm
        m = vm.map_init(131072, 20)
        out = jax.jit(vm.map_size)(m)
        jax.block_until_ready(out)
        print("trigger ran", flush=True)

    R = 20

    @jax.jit
    def many(keys, q):
        tot = jnp.uint32(0)
        for i in range(R):
            tot += jnp.sum(jnp.searchsorted(keys, q + jnp.uint32(i)).astype(jnp.uint32))
        return tot

    out = many(keys, q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = many(keys, q)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"[{variant}] {R} searches in-program: {1e3*dt:.2f} ms total, "
          f"{1e3*dt/R:.3f} ms/search", flush=True)

    # and dispatch-level single search with VARYING input each call
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    qs = [q + jnp.uint32(100 + i) for i in range(10)]
    jax.block_until_ready(qs)
    out = ss(keys, qs[0]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [ss(keys, qq) for qq in qs]
    jax.block_until_ready(outs)
    print(f"[{variant}] dispatch-level varying-input: "
          f"{1e3*(time.perf_counter()-t0)/10:.3f} ms/search", flush=True)

    # dispatch-level with IDENTICAL input each call (the original measurement)
    t0 = time.perf_counter()
    outs = [ss(keys, q) for _ in range(10)]
    jax.block_until_ready(outs)
    print(f"[{variant}] dispatch-level identical-input: "
          f"{1e3*(time.perf_counter()-t0)/10:.3f} ms/search", flush=True)


if __name__ == "__main__":
    main()
