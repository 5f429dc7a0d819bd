"""Leaf-op COUNT accounting: where do the ~2000 leaf ops/scan live?

The r5 wall-busy decomposition (DEVICE_TIME_r05.json) attributes
~1.9 ms/scan to inter-op sequencing (~2000 leaf fusions x ~1-3 us).
This script groups the traced leaf ops by (stage, op kind) and prints
COUNTS + total/mean duration, to find collapsible op families (e.g. the
scalar 6x6 Cholesky chains inside the GN fori_loop, the unrolled lane
selects) before attempting fusion-granularity changes.

Usage: python scripts/r05_opcount.py [n_scans]
"""

import glob
import os
import re
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
from lidar_odometry_demo_tpu.pipeline import odometry

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from device_time_report import classify_op, N_WARM  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8


def main():
    cfg = OdometryConfig()
    drive = simulate_sequence(num_scans=N_WARM + N, width=cfg.scan_width,
                              seed=1, speed=5.0, yaw_rate=0.08)
    scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                             cfg.max_raw_points) for s in drive.scans]
    warm = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[:N_WARM])
    rest = jax.tree.map(lambda *xs: jnp.stack(xs), *scans[N_WARM:])
    run = odometry.make_sequence_runner(cfg)
    state, _ = run(odometry.init_state(cfg), warm)
    _ = float(jnp.sum(state.current.t))
    state, _ = run(state, rest)
    _ = float(jnp.sum(state.current.t))

    shutil.rmtree("/tmp/jaxtrace_opc", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace_opc"):
        state2, _ = run(state, rest)
        _ = float(jnp.sum(state2.current.t)) + float(jnp.sum(state2.keyframe.count))

    pb = glob.glob("/tmp/jaxtrace_opc/**/*.xplane.pb", recursive=True)[0]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs_ = xplane_pb2.XSpace()
    xs_.ParseFromString(open(pb, "rb").read())

    def op_kind(name: str) -> str:
        # strip %, digits-suffix, and shape annotations for a family key
        base = name.split(" ")[0].lstrip("%")
        base = re.sub(r"[.\d]+$", "", base)
        return base

    groups = defaultdict(lambda: [0, 0.0])
    stages = defaultdict(lambda: [0, 0.0])
    for p in xs_.planes:
        if not p.name.endswith("TPU:0"):
            continue
        em = p.event_metadata
        for l in p.lines:
            if l.name != "XLA Ops":
                continue
            for e in l.events:
                name = em[e.metadata_id].name
                stage = classify_op(name)
                if stage == "_control":
                    continue
                ms = e.duration_ps / 1e9 / N
                g = groups[(stage, op_kind(name))]
                g[0] += 1
                g[1] += ms
                s = stages[stage]
                s[0] += 1
                s[1] += ms

    print(f"{'stage':38s} {'ops/scan':>9s} {'ms/scan':>8s}")
    for k, (cnt, ms) in sorted(stages.items(), key=lambda kv: -kv[1][0]):
        print(f"{k:38s} {cnt / N:9.0f} {ms:8.3f}")
    print()
    print(f"{'stage / op family':58s} {'ops/scan':>9s} {'ms/scan':>8s} {'us/op':>6s}")
    for (stage, kind), (cnt, ms) in sorted(
            groups.items(), key=lambda kv: -kv[1][0])[:40]:
        print(f"{stage + ' / ' + kind:58s} {cnt / N:9.0f} {ms:8.3f} "
              f"{1e3 * ms / max(cnt / N, 1e-9):6.2f}")


if __name__ == "__main__":
    main()
