"""Which op inside map_insert degrades subsequent gathers?"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def t_ss(tag, ss, keys, q, n=10):
    out = ss(keys, q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [ss(keys, q) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"searchsorted after {tag:38s} {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    C, Q = 131072, 8192 * 27
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, C), jnp.uint32))
    q = jnp.asarray(rng.integers(0, 2**31, Q), jnp.uint32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))

    t_ss("FRESH", ss, keys, q)

    # 1. stable argsort
    x = jnp.asarray(rng.integers(0, 2**31, 131072), jnp.uint32)
    out = jax.jit(lambda v: jnp.argsort(v, stable=True))(x)
    jax.block_until_ready(out)
    t_ss("stable argsort", ss, keys, q)

    # 2. associative_scan
    out = jax.jit(lambda v: jax.lax.associative_scan(jnp.maximum, v))(x)
    jax.block_until_ready(out)
    t_ss("associative_scan", ss, keys, q)

    # 3. scatter mode=drop into (C,K,3)
    tbl = jnp.zeros((C, 20, 3), jnp.float32)
    sl = jnp.asarray(rng.integers(0, C + 5000, 16384), jnp.int32)
    wi = jnp.asarray(rng.integers(0, 20, 16384), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(16384, 3)), jnp.float32)
    out = jax.jit(lambda t, s, w, v: t.at[s, w].set(v, mode="drop"))(tbl, sl, wi, vals)
    jax.block_until_ready(out)
    t_ss("scatter (C,K,3) mode=drop", ss, keys, q)

    # 4. gather perm of (C,20,3)
    perm = jnp.asarray(rng.permutation(C), jnp.int32)
    out = jax.jit(lambda t, p: t[p])(tbl, perm)
    jax.block_until_ready(out)
    t_ss("permute-gather (C,20,3)", ss, keys, q)

    # 5. scatter 1d mode=drop on keys
    kk = jnp.full((C,), 0xFFFFFFFF, jnp.uint32)
    idx = jnp.asarray(rng.integers(0, C + 100, 20000), jnp.int32)
    vv = jnp.asarray(rng.integers(0, 2**31, 20000), jnp.uint32)
    out = jax.jit(lambda a, i, v: a.at[i].set(v, mode="drop"))(kk, idx, vv)
    jax.block_until_ready(out)
    t_ss("scatter 1d mode=drop", ss, keys, q)

    # 6. boolean ops + where chains (group structure)
    out = jax.jit(lambda v: jnp.cumsum((v != jnp.roll(v, 1)).astype(jnp.int32)))(x)
    jax.block_until_ready(out)
    t_ss("cumsum/roll", ss, keys, q)


if __name__ == "__main__":
    main()
