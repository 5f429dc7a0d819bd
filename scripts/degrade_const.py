"""Is the trigger capturing a module-level jnp device constant by closure?

python scripts/degrade_const.py <jnpconst|npconst|literal|asarg>
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

JNP_BIG = jnp.float32(1e9)   # device scalar created at import time
NP_BIG = np.float32(1e9)     # host scalar -> inlined literal


def probe(tag, n=5):
    rng = np.random.default_rng(1)
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31 - 1, 131072), jnp.int32))
    q = jnp.asarray(rng.integers(0, 2**31 - 1, 8192 * 27), jnp.int32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    out = ss(keys, q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [ss(keys, q) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"[{tag}] probe: {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    variant = sys.argv[1]
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.uniform(0, 0.1, 32768), jnp.float32)
    mask = jnp.asarray(np.arange(32768) < 30000)

    if variant == "jnpconst":
        f = jax.jit(lambda tt, mm: jnp.min(jnp.where(mm, tt, JNP_BIG)))
        out = f(t, mask)
    elif variant == "npconst":
        f = jax.jit(lambda tt, mm: jnp.min(jnp.where(mm, tt, NP_BIG)))
        out = f(t, mask)
    elif variant == "literal":
        f = jax.jit(lambda tt, mm: jnp.min(jnp.where(mm, tt, 1e9)))
        out = f(t, mask)
    elif variant == "asarg":
        f = jax.jit(lambda tt, mm, b: jnp.min(jnp.where(mm, tt, b)))
        out = f(t, mask, JNP_BIG)
    elif variant == "jnpvec":
        vec = jnp.full((8,), 42.0, jnp.float32)  # non-scalar device const
        f = jax.jit(lambda tt, mm: jnp.min(jnp.where(mm, tt, 1e9)) + jnp.sum(vec))
        out = f(t, mask)
    else:
        raise ValueError(variant)
    jax.block_until_ready(out)
    print("ran", variant, flush=True)
    probe(variant)


if __name__ == "__main__":
    main()
