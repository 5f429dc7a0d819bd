"""Chip floor measurement for the map-insert scatter (VERDICT r4 #4: the
third north-star Pallas kernel needs a chip verdict).

Measures the EXACT insert-scatter shape standalone — 147,456 (row, lane)
int32 element writes into the (C + N_in, 128) extended table (the
3-group fused scatter of _update_impl: points + normals + anchors) —
plus the same scatter at half element count, to establish the chip's
element-scatter rate at this shape. Compare against the in-context
xplane number (map_update(insert_scatter) in DEVICE_TIME_r05.json).

Usage: python scripts/r05_scatter_floor.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C, NIN, W = 131072, 16384, 128
N_ELEM = (NIN * 3) * 3   # 3 lanes x 3 groups = 147456
LOOP = 50

rng = np.random.default_rng(0)


def timed(fn, *args, reps=3):
    r = fn(*args)
    _ = float(jnp.sum(r))
    ts = []
    for _i in range(reps):
        t0 = time.time()
        r = fn(*args)
        _ = float(jnp.sum(r))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    print(f"devices={jax.devices()}", file=sys.stderr)
    tiny = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def empty(x):
        def body(i, acc):
            return acc + jnp.sum(x) * jnp.float32(i)
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    floor = timed(empty, tiny)

    tab = jnp.zeros((C + NIN, W), jnp.int32)
    results = {}
    for n in (N_ELEM, N_ELEM // 2):
        rows = jnp.asarray(rng.integers(0, C + NIN, n).astype(np.int32))
        lanes = jnp.asarray(rng.integers(0, W, n).astype(np.int32))
        vals = jnp.asarray(rng.integers(0, 1000, n).astype(np.int32))

        @jax.jit
        def scat(tab, rows, lanes, vals):
            def body(i, acc):
                t = tab.at[
                    jnp.minimum(rows + i, C + NIN - 1), lanes
                ].set(vals, mode="drop")
                return acc + t[i & 1023, 0]
            return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

        ms = max(timed(scat, tab, rows, lanes, vals) - floor, 0) / LOOP * 1e3
        results[f"scatter_{n}_elem_ms"] = round(ms, 4)
        results[f"scatter_{n}_rate_M_per_s"] = round(n / (ms * 1e-3) / 1e6, 1)
        print(f"scatter {n} elems: {ms:.4f} ms ({n/(ms*1e-3)/1e6:.0f} M/s)",
              file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
