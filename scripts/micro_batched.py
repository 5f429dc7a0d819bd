"""Microbench: which primitive degrades under vmap/batching on this TPU.

The tunneled runtime has a ~25 ms dispatch+fetch floor, so each op is
iterated N times inside ONE jit program (fori_loop with rotating inputs,
checksum carried so nothing is DCE'd) and the floor is subtracted out by
the division.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, C, Q, W = 8, 131072, 8192, 64
N_ITERS = 30
rng = np.random.default_rng(0)


def bench(name, build_fn, *args, iters=N_ITERS, reps=2):
    fn = build_fn(iters)
    out = fn(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.time() - t0)
    print(f"{name:46s} {1e3*min(ts)/iters:8.3f} ms/op", flush=True)


table_b = jnp.asarray(rng.normal(size=(B, C, W)).astype(np.float32))
idx_b = jnp.asarray(rng.integers(0, C, (B, Q, 27)).astype(np.int32))
table_flat = table_b.reshape(B * C, W)
lane_off = (np.arange(B, dtype=np.int32) * C)[:, None, None]
idx_flat = idx_b + jnp.asarray(lane_off)


def loop(body, iters):
    @jax.jit
    def run(*args):
        def step(i, acc):
            return acc + body(i, *args)
        return jax.lax.fori_loop(0, iters, step, jnp.float32(0.0))
    return run


def build_gather_vmapped(iters):
    def body(i, tb, ib):
        ib = (ib + i) % C
        return jnp.sum(jax.vmap(lambda t, ix: t[ix])(tb, ib))
    return loop(body, iters)


def build_gather_flat(iters):
    def body(i, tf, if_):
        if_ = (if_ + i) % (B * C)
        return jnp.sum(tf[if_.reshape(-1)])
    return loop(body, iters)


def build_gather_single(iters):
    def body(i, t, ix):
        ix = (ix + i) % C
        return jnp.sum(t[ix])
    return loop(body, iters)


bench("gather (B,C,W)[B,Q,27] vmapped", build_gather_vmapped, table_b, idx_b)
bench("gather flat (B*C,W)[B*Q*27]", build_gather_flat, table_flat, idx_flat)
bench("gather single-lane x1 (C,W)[Q,27]", build_gather_single, table_b[0], idx_b[0])

keys_b = jnp.asarray(rng.integers(0, 2**31 - 1, (B, C)).astype(np.int32))


def build_argsort_b(iters):
    def body(i, k):
        return jnp.sum(jnp.argsort(k ^ i, axis=-1).astype(jnp.float32)) * 1e-9
    return loop(body, iters)


def build_argsort_single(iters):
    def body(i, k):
        return jnp.sum(jnp.argsort(k ^ i).astype(jnp.float32)) * 1e-9
    return loop(body, iters)


bench("argsort (B,C) batched", build_argsort_b, keys_b)
bench("argsort single (C,) x1", build_argsort_single, keys_b[0])

pay_b = jnp.asarray(rng.normal(size=(B, C, 60)).astype(np.float32))
perm_b = jnp.asarray(np.stack([rng.permutation(C) for _ in range(B)]).astype(np.int32))


def build_permute_vmapped(iters):
    def body(i, p, perm):
        perm = (perm + i) % C
        return jnp.sum(jax.vmap(lambda x, pr: x[pr])(p, perm))
    return loop(body, iters)


def build_permute_single(iters):
    def body(i, p, perm):
        perm = (perm + i) % C
        return jnp.sum(p[perm])
    return loop(body, iters)


bench("permute payload (B,C,60) vmapped", build_permute_vmapped, pay_b, perm_b)
bench("permute single (C,60) x1", build_permute_single, pay_b[0], perm_b[0])

G = 1 << 20
cell_b = jnp.asarray(rng.integers(0, G, (B, C)).astype(np.int32))


def build_scatter_vmapped(iters):
    def body(i, cb):
        cb = (cb + i) % G
        def one(c):
            d = jnp.full((G + 1,), np.int32(0x7FFFFFFF), jnp.int32)
            return d.at[c].min(jnp.arange(C, dtype=jnp.int32))
        return jnp.sum(jax.vmap(one)(cb)).astype(jnp.float32) * 1e-9
    return loop(body, iters)


def build_scatter_single(iters):
    def body(i, c):
        c = (c + i) % G
        d = jnp.full((G + 1,), np.int32(0x7FFFFFFF), jnp.int32)
        return jnp.sum(d.at[c].min(jnp.arange(C, dtype=jnp.int32))).astype(jnp.float32) * 1e-9
    return loop(body, iters)


bench("scatter-min (B,1M) vmapped", build_scatter_vmapped, cell_b)
bench("scatter-min single (1M,) x1", build_scatter_single, cell_b[0])
