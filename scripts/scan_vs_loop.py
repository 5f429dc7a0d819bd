"""Is the lax.scan sequence runner slow vs chained single-step dispatches?"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry


def force(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def probe(tag, n=5):
    rng = np.random.default_rng(1)
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2**31 - 1, 131072), jnp.int32))
    q = jnp.asarray(rng.integers(0, 2**31 - 1, 8192 * 27), jnp.int32)
    ss = jax.jit(lambda k, x: jnp.searchsorted(k, x))
    out = ss(keys, q); out.block_until_ready()
    t0 = time.perf_counter()
    outs = [ss(keys, q) for _ in range(n)]
    _ = [float(o[0]) for o in outs]
    print(f"probe[{tag}]: {1e3*(time.perf_counter()-t0)/n:.3f} ms", flush=True)


def main():
    cfg = OdometryConfig()
    n_scans = 10
    drive = simulate_sequence(num_scans=n_scans, width=cfg.scan_width, seed=42, speed=5.0, yaw_rate=0.08)
    scans = [
        scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
        for s in drive.scans
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    step = jax.jit(odometry.make_process_scan(cfg))
    state0 = odometry.init_state(cfg)

    # warm
    st, dg = step(state0, scans[0])
    force(st.current.t)
    probe("after step compile")

    # python loop, async chained
    st = state0
    t0 = time.perf_counter()
    iters = []
    for sc in scans:
        st, dg = step(st, sc)
        iters.append(dg.icp_iterations)
    force(st.current.t)
    total_iters = [int(i) for i in iters]
    dt = time.perf_counter() - t0
    print(f"python loop: {1e3*dt/n_scans:.1f} ms/scan  iters={total_iters}", flush=True)
    probe("after python loop")

    # lax.scan runner
    runner = odometry.make_sequence_runner(cfg)
    t0 = time.perf_counter()
    fs, diags = runner(state0, stacked)
    force(fs.current.t)
    print(f"lax.scan (compile+run): {time.perf_counter()-t0:.1f} s", flush=True)
    probe("after scan compile+run")

    t0 = time.perf_counter()
    fs, diags = runner(state0, stacked._replace(xyz=stacked.xyz + np.float32(1e-4)))
    force(fs.current.t)
    dt = time.perf_counter() - t0
    print(f"lax.scan steady: {1e3*dt/n_scans:.1f} ms/scan", flush=True)
    probe("after scan steady")

    # python loop again (post-scan state of the process)
    st = state0
    t0 = time.perf_counter()
    for sc in scans:
        st, dg = step(st, sc._replace(xyz=sc.xyz + np.float32(1e-4)))
    force(st.current.t)
    dt = time.perf_counter() - t0
    print(f"python loop (again): {1e3*dt/n_scans:.1f} ms/scan", flush=True)


if __name__ == "__main__":
    main()
