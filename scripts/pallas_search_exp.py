"""Experiment: Pallas TPU binary search with VMEM-resident key table."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:44s} {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)
    return out


def make_search(C, Q_TILE, steps):
    def kernel(keys_ref, q_ref, out_ref):
        q = q_ref[:]  # (Q_TILE,) uint32  -> reshape 2D for TPU
        lo = jnp.zeros(q.shape, jnp.int32)
        hi = jnp.full(q.shape, C, jnp.int32)
        for _ in range(steps):
            mid = (lo + hi) // 2
            kv = keys_ref[jnp.minimum(mid, C - 1)]
            less = kv < q
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        out_ref[:] = lo

    def search(keys, queries):
        Q = queries.shape[0]
        grid = (Q // Q_TILE,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[
                    pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((Q_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Q_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ),
        )(keys, queries)

    return search


def main():
    rng = np.random.default_rng(0)
    C = 131072
    Q = 8192 * 27
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, C), jnp.uint32))
    q = jnp.asarray(rng.integers(0, 2**31, Q), jnp.uint32)

    ref = jnp.searchsorted(keys, q).astype(jnp.int32)
    jax.block_until_ready(ref)

    for tile in (4096, 8192, 32768):
        try:
            fn = jax.jit(make_search(C, tile, 17))
            out = fn(keys, q)
            ok = bool(jnp.all(out == ref))
            print(f"tile={tile}: correct={ok}", flush=True)
            timeit(f"pallas search tile={tile}", fn, keys, q)
        except Exception as e:
            print(f"tile={tile} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    timeit("xla searchsorted", jax.jit(lambda k, x: jnp.searchsorted(k, x)), keys, q)


if __name__ == "__main__":
    main()
