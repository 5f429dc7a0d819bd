"""Micro-benchmark: gather layouts on TPU (row sizes / shapes)."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {1e3*dt:9.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    C, Q = 131072, 8192 * 27
    idx = jnp.asarray(rng.integers(0, C, Q), jnp.int32)

    a_small = jnp.asarray(rng.normal(size=(C, 20, 3)), jnp.float32)
    a_row128 = jnp.asarray(rng.normal(size=(C, 128)), jnp.float32)
    a_row256 = jnp.asarray(rng.normal(size=(C, 256)), jnp.float32)

    g1 = jax.jit(lambda a, i: jnp.sum(a[i], axis=(-1, -2)))
    g2 = jax.jit(lambda a, i: jnp.sum(a[i], axis=-1))
    timeit("gather (221k, 20,3) rows", g1, a_small, idx)
    timeit("gather (221k, 128) rows", g2, a_row128, idx)
    timeit("gather (221k, 256) rows", g2, a_row256, idx)

    idx_sorted = jnp.sort(idx)
    timeit("gather (221k, 128) rows sorted idx", g2, a_row128, idx_sorted)

    # searchsorted cost
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, C), jnp.uint32))
    q = jnp.asarray(rng.integers(0, 2**31, Q), jnp.uint32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    timeit("searchsorted 221k into 131k", ss, keys, q)

    # scatter cost (map insert analogue): 16k points into (C,128)
    M = 16384
    sl = jnp.asarray(rng.integers(0, C, M), jnp.int32)
    col = jnp.asarray(rng.integers(0, 40, M) * 3, jnp.int32)
    vals = jnp.asarray(rng.normal(size=(M, 3)), jnp.float32)
    def scat(a, sl, col, vals):
        flat = a.reshape(-1)
        base = sl * 128 + col
        idx3 = base[:, None] + jnp.arange(3)[None, :]
        return flat.at[idx3].set(vals).reshape(a.shape)
    timeit("flat scatter 16k x 3 into (C,128)", jax.jit(scat), a_row128, sl, col, vals)

    # argsort cost
    timeit("argsort 131k u32", jax.jit(jnp.argsort), keys)
    timeit("argsort 32k u32", jax.jit(jnp.argsort), q[:32768])

    # permute-gather full table
    perm = jnp.asarray(rng.permutation(C), jnp.int32)
    timeit("permute (C,128)", g2, a_row128, perm)
    timeit("permute (C,20,3)", g1, a_small, perm)


if __name__ == "__main__":
    main()
