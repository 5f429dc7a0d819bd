"""Quick TPU health probe: fresh-process searchsorted throughput.

~0.05 ms = healthy; ~30+ ms = degraded/contended. Exit code 0 if healthy.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    rng = np.random.default_rng(1)
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31 - 1, 131072), jnp.int32))
    q = jnp.asarray(rng.integers(0, 2**31 - 1, 8192 * 27), jnp.int32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    _ = int(ss(keys, q)[0])
    t0 = time.perf_counter()
    n = 8
    for i in range(n):
        _ = int(ss(keys, q + jnp.int32(i))[0])
    dt = 1e3 * (time.perf_counter() - t0) / n
    print(f"probe: {dt:.3f} ms ({jax.devices()})", flush=True)
    sys.exit(0 if dt < 2.0 else 1)


if __name__ == "__main__":
    main()
