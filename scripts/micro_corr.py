"""Microbenchmark: correspondence-pass building blocks, timed in-program.

Each candidate op runs R times inside one lax.scan program (carry-dependent
so iterations can't be collapsed), with a value-fetch completion barrier.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

C = 131072       # table capacity
Q = 8192         # queries
NCOL = 9         # column searches per query
NPROBE = 27      # probed slots per query
K = 20           # points per voxel
REPS = 50


def timed(name, fn, *args):
    out = jax.jit(fn)(*args)
    _ = float(jnp.sum(out))
    t0 = time.time()
    out = jax.jit(fn)(*args)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / REPS
    print(f"{name:46s} {1e3*dt:8.3f} ms/pass")


def main():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(np.sort(rng.choice(2**30, C, replace=False)).astype(np.int32))
    qk = jnp.asarray(rng.choice(2**30, (Q * NCOL,)).astype(np.int32))
    rows60 = jnp.asarray(rng.standard_normal((C, 60)).astype(np.float32))
    rows64 = jnp.asarray(rng.standard_normal((C, 64)).astype(np.float32))
    rows128 = jnp.asarray(rng.standard_normal((C, 128)).astype(np.float32))
    pos0 = jnp.asarray(rng.integers(0, C, (Q * NPROBE,)).astype(np.int32))

    def loop(body):
        def fn(qk_or_pos):
            def step(carry, _):
                out = body(qk_or_pos + (carry & 1))
                return carry + 1, jnp.sum(out, dtype=jnp.float32)
            _, sums = jax.lax.scan(step, jnp.int32(0), None, length=REPS)
            return sums
        return fn

    timed("searchsorted 73k into 131k",
          loop(lambda q: jnp.searchsorted(keys, q).astype(jnp.int32)), qk)

    timed("gather 221k rows of 60 f32",
          loop(lambda p: rows60[jnp.minimum(p, C - 1)]), pos0)

    timed("gather 221k rows of 64 f32",
          loop(lambda p: rows64[jnp.minimum(p, C - 1)]), pos0)

    timed("gather 221k rows of 128 f32",
          loop(lambda p: rows128[jnp.minimum(p, C - 1)]), pos0)

    timed("gather 221k scalars (int32 keys)",
          loop(lambda p: keys[jnp.minimum(p, C - 1)].astype(jnp.float32)), pos0)

    # the d2+argmin reduction, given pre-gathered candidates
    cand = jnp.asarray(rng.standard_normal((Q, NPROBE, K, 3)).astype(np.float32))
    qw = jnp.asarray(rng.standard_normal((Q, 3)).astype(np.float32))

    def reduce(q_shift):
        d2 = jnp.sum((cand - qw[:, None, None, :] - q_shift[0, :3][None, None, None, :]) ** 2, -1)
        flat = d2.reshape(Q, -1)
        best = jnp.argmin(flat, axis=-1)
        return jnp.take_along_axis(flat, best[:, None], axis=-1)

    timed("d2+argmin reduce (Q,27,20)",
          loop(lambda p: reduce(p.astype(jnp.float32) * 1e-9)), pos0)

    # fused: one one-hot matmul instead (for reference)
    def gather_via_slice(p):
        # contiguity control: single dynamic_slice per row is what XLA does;
        # compare gather of rows with sorted indices
        ps = jnp.sort(p)
        return rows64[jnp.minimum(ps, C - 1)]

    timed("gather 221k rows of 64 f32 (sorted idx)", loop(gather_via_slice), pos0)


if __name__ == "__main__":
    main()
