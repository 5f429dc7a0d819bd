"""A/B: per-GN-step normal-equation accumulation formulations on chip.

The XLA path computes H = J^T W J / b = J^T W r as two (Q, 6) matmuls at
Precision.HIGHEST (ops/icp.py _normal_equations); that is 32 tiny-M
MXU dispatches per scan (4 outer x 4 inner x 2). The alternative is 27
fused elementwise reductions over the same (Q,) streams (21 unique H
entries + 6 b entries), which the VPU can fuse with the residual math.

Both computed per-iteration with i-dependent inputs; min-of-reps.
Usage: python scripts/r05_gn_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

Q = 8192
LOOP = 100


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
    rng = np.random.default_rng(0)
    sl = jnp.asarray(rng.normal(0, 20, (Q, 3)).astype(np.float32))
    pn = jnp.asarray(rng.normal(0, 1, (Q, 3)).astype(np.float32))
    po = jnp.asarray(rng.normal(0, 20, (Q, 3)).astype(np.float32))
    w0 = jnp.asarray(rng.uniform(0, 1, (Q,)).astype(np.float32))
    tiny = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def empty(x):
        def body(i, acc):
            return acc + jnp.sum(x) * jnp.float32(i)
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    floor = timed(empty, tiny)

    def build_J_r(i):
        rp = sl + jnp.float32(i) * 1e-6
        r = jnp.sum((rp - po) * pn, axis=-1)
        j_rot = jnp.cross(rp, pn)
        J = jnp.concatenate([j_rot, pn], axis=-1)
        return J, r

    @jax.jit
    def mm(sl, pn, po, w0):
        def body(i, acc):
            J, r = build_J_r(i)
            Jw = J * w0[:, None]
            H = jnp.matmul(J.T, Jw, precision=jax.lax.Precision.HIGHEST)
            b = jnp.matmul(Jw.T, r, precision=jax.lax.Precision.HIGHEST)
            return acc + H[0, 0] + b[0]
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    t_mm = (timed(mm, sl, pn, po, w0) - floor) / LOOP * 1e3

    @jax.jit
    def ew(sl, pn, po, w0):
        def body(i, acc):
            J, r = build_J_r(i)
            cols = [J[:, k] for k in range(6)]
            acc2 = acc
            for a in range(6):
                wa = cols[a] * w0
                for b_ in range(a, 6):
                    acc2 = acc2 + jnp.sum(wa * cols[b_]) * jnp.float32(
                        1 + a + b_)
                acc2 = acc2 + jnp.sum(wa * r)
            return acc2
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    t_ew = (timed(ew, sl, pn, po, w0) - floor) / LOOP * 1e3
    out = {"matmul_ms_per_step": round(t_mm, 4),
           "elementwise_ms_per_step": round(t_ew, 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
