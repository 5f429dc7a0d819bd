"""At what f32 magnitude does the sentinel trigger degradation?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

_rng = np.random.default_rng(1)
_keys = jnp.sort(jnp.asarray(_rng.integers(0, 2**31 - 1, 131072), jnp.int32))
_q = jnp.asarray(_rng.integers(0, 2**31 - 1, 8192 * 27), jnp.int32)
_ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))


def probe(tag, n=5):
    out = _ss(_keys, _q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [_ss(_keys, _q) for _ in range(n)]
    jax.block_until_ready(outs)
    dt = 1e3 * (time.perf_counter() - t0) / n
    print(f"probe after {tag:24s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    t = jnp.asarray(_rng.uniform(0, 0.1, 32768), jnp.float32)
    mask = jnp.asarray(np.arange(32768) < 30000)

    probe("START")
    for big in (1e9, 1e20, 1e30, 1e35, 3e38, float("inf")):
        f = jax.jit(lambda tt, mm, b=big: (
            jnp.min(jnp.where(mm, tt, jnp.float32(b))),
            jnp.max(jnp.where(mm, tt, jnp.float32(-b))),
        ))
        out = f(t, mask)
        jax.block_until_ready(out)
        dt = probe(f"sentinel {big:g}")
        if dt > 5.0:
            print(f"DEGRADED at sentinel {big:g}", flush=True)
            break


if __name__ == "__main__":
    main()
