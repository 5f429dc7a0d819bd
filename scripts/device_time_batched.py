"""Per-stage DEVICE-TIME accounting of the BATCHED (vmapped x B) odometry
step, side by side with the single-sequence breakdown (VERDICT r4 next
-round #2: explain the batched < 1.0x per-lane efficiency).

Same xplane methodology and stage classifier as device_time_report.py
(shape signatures match inside the batched shapes too: `s32[8,73728,64]`
still contains the `73728,64` token). Writes
benchmarks/DEVICE_TIME_BATCHED_r05.json with ms/LANE-SCAN stage numbers
and the single-seq comparison when DEVICE_TIME_r05.json exists.

Usage: python scripts/device_time_batched.py [B] [n_scans]
"""

import glob
import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

from device_time_report import classify_op, log
from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.parallel import batched
from lidar_odometry_demo_tpu.pipeline import odometry

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_WARM = 10
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8

cfg = OdometryConfig()


def main():
    log("simulating...")
    drive = simulate_sequence(num_scans=N_WARM + N, width=cfg.scan_width,
                              seed=1, speed=5.0, yaw_rate=0.08)
    scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                             cfg.max_raw_points) for s in drive.scans]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    scans_b = jax.tree.map(
        lambda x: jnp.broadcast_to(
            x[:, None], (x.shape[0], B, *x.shape[1:])).copy(), stacked)
    scans_b = jax.device_put(scans_b)
    warm = jax.tree.map(lambda x: x[:N_WARM], scans_b)
    rest = jax.tree.map(lambda x: x[N_WARM:], scans_b)

    vstep = jax.vmap(odometry.make_process_scan(cfg))

    @jax.jit
    def run(state, scans):
        return jax.lax.scan(vstep, state, scans)

    state0 = batched.init_batched_state(cfg, B)
    log("warm compile+run...")
    state, _ = run(state0, warm)
    _ = float(jnp.sum(state.current.t))
    log("steady compile+run...")
    state, diags = run(state, rest)
    _ = float(jnp.sum(state.current.t))
    icp_iters = [int(x) for x in np.asarray(diags.icp_iterations)[:, 0]]

    t0 = time.time()
    state2, _ = run(state, rest)
    _ = float(jnp.sum(state2.current.t)) + float(jnp.sum(state2.keyframe.count))
    wall_ms = (time.time() - t0) * 1e3 / (N * B)

    log(f"wall {wall_ms:.2f} ms/lane-scan; tracing...")
    shutil.rmtree("/tmp/jaxtrace_dtb", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace_dtb"):
        state2, _ = run(state, rest)
        _ = float(jnp.sum(state2.current.t)) + float(
            jnp.sum(state2.keyframe.count))

    log("parsing xplane...")
    pb = glob.glob("/tmp/jaxtrace_dtb/**/*.xplane.pb", recursive=True)[0]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs_ = xplane_pb2.XSpace()
    xs_.ParseFromString(open(pb, "rb").read())
    stage_ms = defaultdict(float)
    top_ops = defaultdict(float)
    total_leaf = 0.0
    for p in xs_.planes:
        if not p.name.endswith("TPU:0"):
            continue
        em = p.event_metadata
        for l in p.lines:
            if l.name != "XLA Ops":
                continue
            for e in l.events:
                name = em[e.metadata_id].name
                ms = e.duration_ps / 1e9 / (N * B)   # per LANE-scan
                stage = classify_op(name)
                stage_ms[stage] += ms
                if stage != "_control":
                    total_leaf += ms
                    top_ops[(stage, name[:110])] += ms

    stages = {k: round(v, 3) for k, v in
              sorted(stage_ms.items(), key=lambda kv: -kv[1])
              if k != "_control"}

    single_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "DEVICE_TIME_r05.json")
    single = None
    if os.path.exists(single_path):
        single = json.load(open(single_path))

    comparison = None
    if single:
        comparison = {
            k: {"batched_ms_per_lane_scan": stages.get(k, 0.0),
                "single_ms_per_scan": single["stage_ms_per_scan"].get(k, 0.0),
                "ratio": round(
                    stages.get(k, 0.0)
                    / max(single["stage_ms_per_scan"].get(k, 0.0), 1e-9), 2)}
            for k in sorted(set(stages) | set(single["stage_ms_per_scan"]))
        }

    report = {
        "round": 5,
        "B": B,
        "n_scans_traced": N,
        "icp_outer_iterations_per_scan_lane0": icp_iters,
        "wall_ms_per_lane_scan": round(wall_ms, 3),
        "device_busy_ms_per_lane_scan": round(total_leaf, 3),
        "single_seq_busy_ms_per_scan": (
            single["device_busy_ms_per_scan"] if single else None),
        "stage_ms_per_lane_scan": stages,
        "vs_single_seq": comparison,
        "top_ops_ms_per_lane_scan": [
            {"stage": s, "ms": round(v, 3), "op": n}
            for (s, n), v in sorted(top_ops.items(), key=lambda kv: -kv[1])[:25]
        ],
    }
    out_json = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "DEVICE_TIME_BATCHED_r05.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("top_ops_ms_per_lane_scan",)}, indent=1))
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
