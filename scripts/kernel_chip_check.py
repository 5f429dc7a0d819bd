"""On-chip check + micro-timing of the Pallas ICP kernels vs their XLA
formulations at bench shapes (i-dependent loops defeat CSE hoisting).
Writes results to stdout; feeds DESIGN.md's r4 Pallas table.
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.pallas.correspondence import match_rows
from lidar_odometry_demo_tpu.ops.pallas.jtwj import jtwj_accumulate

Q, K = 8192, 20
RW = vm._lanes(K)[0]
rng = np.random.default_rng(0)
q = jnp.asarray(rng.uniform(-5, 5, (Q, 3)).astype(np.float32))
rows_f = np.zeros((Q, 9, 3, RW), np.float32)
pts = rng.uniform(-5, 5, (Q, 9, 3, K, 3)).astype(np.float32)
rows_f[..., 0:K] = pts[..., 0]; rows_f[..., K:2*K] = pts[..., 1]
rows_f[..., 2*K:3*K] = pts[..., 2]
rows_f[..., 3*K] = rng.integers(0, K+1, (Q, 9, 3))
rows = jnp.asarray(rows_f.reshape(Q, 9, 3*RW).view(np.int32))
npres = jnp.asarray(rng.integers(0, 4, (Q, 9)).astype(np.int32))


def timeit(name, fn, *args, n=100):
    r = fn(*args); jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), r)
    ts = []
    for _ in range(3):
        t0 = time.time(); r = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), r)
        ts.append(time.time() - t0)
    ms = (min(ts) - 0.025) / n * 1e3
    print(f"{name}: {ms:.3f} ms/call (raw {min(ts)*1e3:.0f} ms / {n})", flush=True)
    return ms


def xla_match(qj, rowsj, npresj):
    QR, RW3 = rowsj.shape[0] * 9, rowsj.shape[-1]
    flat = rowsj.swapaxes(0, 1).reshape(QR, RW3)   # (9, Q)-major flat
    rw = RW3 // 3
    cand = vm.CandidateSet(
        rows_z=tuple(flat[:, s_ * rw:(s_ + 1) * rw] for s_ in range(3)),
        base=jnp.zeros((9, Q), jnp.int32), n_present=npresj.T)
    m = vm.map_init(1024, K)
    c = vm._select_best(m, cand, qj, jnp.ones(Q, bool), jnp.zeros(3),
                        jnp.eye(3), 0.3)
    return c.plane_origin


@jax.jit
def xla_loop(qj, rowsj, npresj):
    def body(i, acc):
        o = xla_match(qj + jnp.float32(i) * 1e-6, rowsj, npresj)
        return acc + jnp.sum(o)
    return jax.lax.fori_loop(0, 100, body, jnp.float32(0))


@jax.jit
def pls_loop(qj, rowsj, npresj):
    def body(i, acc):
        o, _, d = match_rows(qj + jnp.float32(i) * 1e-6, rowsj, npresj,
                             max_d2=0.09, max_points=K)
        return acc + jnp.sum(o) + jnp.sum(d)
    return jax.lax.fori_loop(0, 100, body, jnp.float32(0))


def safe(name, *a):
    try:
        return timeit(name, *a)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:140]}",
              flush=True)
        return None


xm = safe("match XLA x100", xla_loop, q, rows, npres)
pm = safe("match PALLAS x100", pls_loop, q, rows, npres)

sl = jnp.asarray(rng.uniform(-20, 20, (Q, 3)).astype(np.float32))
pn0 = rng.normal(0, 1, (Q, 3)).astype(np.float32)
pn = jnp.asarray(pn0 / np.linalg.norm(pn0, axis=1, keepdims=True))
po = sl + 0.01
valid = jnp.ones(Q, bool)
R = jnp.eye(3); t = jnp.zeros(3)

from lidar_odometry_demo_tpu.ops.icp import _rot_pts


def xla_jtwj(slj):
    rp = _rot_pts(slj, R)
    r = jnp.sum((rp + t - po) * pn, axis=-1)
    absr = jnp.abs(r)
    w = jnp.where(absr <= 0.15, 1.0, 0.15 / jnp.maximum(absr, 1e-30))
    J = jnp.concatenate([jnp.cross(rp, pn), pn], axis=-1)
    Jw = J * w[:, None]
    H = jnp.matmul(J.T, Jw, precision=jax.lax.Precision.HIGHEST)
    b = jnp.matmul(Jw.T, r, precision=jax.lax.Precision.HIGHEST)
    return H, b


@jax.jit
def xj_loop(slj):
    def body(i, acc):
        H, b = xla_jtwj(slj + jnp.float32(i) * 1e-6)
        return acc + jnp.sum(H) + jnp.sum(b)
    return jax.lax.fori_loop(0, 100, body, jnp.float32(0))


@jax.jit
def pj_loop(slj):
    def body(i, acc):
        H, b = jtwj_accumulate(slj + jnp.float32(i) * 1e-6, po, pn, valid,
                               R, t, huber_delta=0.15)
        return acc + jnp.sum(H) + jnp.sum(b)
    return jax.lax.fori_loop(0, 100, body, jnp.float32(0))


xj = safe("jtwj XLA x100", xj_loop, sl)
pj = safe("jtwj PALLAS x100", pj_loop, sl)
print(f"RESULT match {xm}->{pm} ms; jtwj {xj}->{pj} ms", flush=True)
