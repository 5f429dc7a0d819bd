"""Which primitive inside pack_keys degrades the process?

python scripts/degrade_pack.py <variant>
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def t_ss(tag, n=10):
    rng = np.random.default_rng(1)
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31, 131072), jnp.uint32))
    q = jnp.asarray(rng.integers(0, 2**31, 8192 * 27), jnp.uint32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    out = ss(keys, q)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [ss(keys, q) for _ in range(n)]
    jax.block_until_ready(outs)
    print(f"[{tag}] searchsorted: {1e3*(time.perf_counter()-t0)/n:9.3f} ms", flush=True)


def main():
    variant = sys.argv[1]
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-60, 60, (131072, 3)), jnp.float32)
    valid = jnp.asarray(np.arange(131072) < 120000)

    def frag(xyz, valid):
        if variant == "div":
            return jnp.sum(xyz / 0.2)
        if variant == "trunc":
            return jnp.sum(jnp.trunc(xyz / 0.2))
        if variant == "toint":
            return jnp.sum(jnp.trunc(xyz / 0.2).astype(jnp.int32))
        idx = jnp.trunc(xyz / 0.2).astype(jnp.int32)
        rx = idx[..., 0] + 1024
        ry = idx[..., 1] + 1024
        rz = idx[..., 2] + 512
        if variant == "addoff":
            return jnp.sum(rx + ry + rz)
        in_range = (rx >= 0) & (rx < 2047) & (ry >= 0) & (ry < 2047) & (rz >= 0) & (rz < 1023)
        if variant == "compare":
            return jnp.sum(in_range)
        key_u = (rx.astype(jnp.uint32) << 21) | (ry.astype(jnp.uint32) << 10) | rz.astype(jnp.uint32)
        if variant == "shiftor":
            return jnp.sum(key_u)
        key = jnp.where(valid & in_range, key_u, jnp.uint32(0xFFFFFFFF))
        if variant == "where":
            return jnp.sum(key)
        if variant == "int32key":
            key_i = (rx << 21) | (ry << 10) | rz
            keyi = jnp.where(valid & in_range, key_i, jnp.int32(0x7FFFFFFF))
            return jnp.sum(keyi)
        raise ValueError(variant)

    if variant != "none":
        out = jax.jit(frag)(xyz, valid)
        jax.block_until_ready(out)
        print("ran", variant, flush=True)
    t_ss(variant)


if __name__ == "__main__":
    main()
