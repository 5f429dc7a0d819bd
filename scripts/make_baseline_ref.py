"""Generate the pinned reference-baseline artifact (BASELINE.md's "first
benchmarking task": the reference publishes no numbers, so the build must
produce them).

Runs the independent NumPy oracle pipeline (oracle/full_pipeline.py — the
documented reference semantics, dict/loop implementation sharing no hot
code with the JAX engine) in STRICT REFERENCE PARITY mode over the exact
bench.py drive (W=1800, 40 scans, seed 42, 5 m/s), and writes:

- benchmarks/BASELINE_REF.tum   — the pinned reference trajectory (TUM)
- benchmarks/BASELINE_REF.json  — measured oracle scans/s + ATE vs sim GT

bench.py then reports the TPU engine's ATE against this pinned trajectory,
so "parity with the reference" is measured against a committed artifact
rather than recomputed ground truth. The measured oracle throughput is
recorded for context but is NOT the vs_baseline denominator: the oracle is
NumPy, not the reference's C++ — the honest throughput bar remains the
reference's implied real-time requirement (10 Hz VLP16, BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    from lidar_odometry_demo_tpu.config import OdometryConfig, reference_parity
    from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
    from lidar_odometry_demo_tpu.io.trajectory import ate_rmse, write_tum
    from lidar_odometry_demo_tpu.oracle.full_pipeline import OracleOdometry

    cfg = reference_parity(OdometryConfig())
    num_scans = 40
    drive = simulate_sequence(num_scans=num_scans, width=cfg.scan_width,
                              seed=42, speed=5.0, yaw_rate=0.08)

    oracle = OracleOdometry(cfg)
    ts, qs, per_scan = [], [], []
    t_total0 = time.time()
    for i, s in enumerate(drive.scans):
        t0 = time.time()
        oracle.process(s["xyz"], s["ring"], s["time"])
        dt = time.time() - t0
        per_scan.append(dt)
        ts.append(oracle.current.t.copy())
        qs.append(oracle.current.quat_wxyz())
        print(f"scan {i}: {dt:.1f}s t={np.round(oracle.current.t, 3)}",
              file=sys.stderr, flush=True)
    total = time.time() - t_total0

    ts = np.asarray(ts)
    qs = np.asarray(qs)
    stamps = np.arange(num_scans) * 0.1

    from scipy.spatial.transform import Rotation

    g0_R = Rotation.from_quat(
        [drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]])
    gt_rel = g0_R.inv().apply(drive.gt_t - drive.gt_t[0])
    ate = float(ate_rmse(ts, gt_rel, align=True))

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks")
    write_tum(os.path.join(out_dir, "BASELINE_REF.tum"), stamps, ts, qs)
    with open(os.path.join(out_dir, "BASELINE_REF.json"), "w") as f:
        json.dump(
            {
                "generator": "scripts/make_baseline_ref.py",
                "semantics": "REFERENCE_PARITY (oracle/full_pipeline.py)",
                "drive": {"num_scans": num_scans, "width": cfg.scan_width,
                          "seed": 42, "speed": 5.0, "yaw_rate": 0.08},
                "oracle_scans_per_sec": num_scans / total,
                "oracle_total_s": total,
                "oracle_per_scan_s": per_scan,
                "aligned_ate_vs_sim_gt_m": ate,
                "note": "oracle is NumPy, not the reference C++; its "
                        "throughput is context, not the vs_baseline bar",
            },
            f, indent=1)
    print(f"done: {num_scans / total:.2f} scans/s, ATE {ate:.3f} m")


if __name__ == "__main__":
    main()
