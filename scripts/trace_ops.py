"""Capture an xplane trace of the batched step and print top TPU leaf ops.

Usage: python scripts/trace_ops.py [B] [n_scans]
Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the proto parse.
"""
import glob
import os
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
from lidar_odometry_demo_tpu.parallel import batched
from lidar_odometry_demo_tpu.pipeline import odometry

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
n = int(sys.argv[2]) if len(sys.argv) > 2 else 6

cfg = OdometryConfig()
drive = simulate_sequence(num_scans=n, width=cfg.scan_width, seed=1, speed=5.0)
scans = [scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                         cfg.max_raw_points) for s in drive.scans]
stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

if B > 0:
    scans_in = jax.tree.map(
        lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], B, *x.shape[1:])).copy(),
        stacked)
    step = jax.vmap(odometry.make_process_scan(cfg))
    state0 = batched.init_batched_state(cfg, B)
else:
    scans_in = stacked
    step = odometry.make_process_scan(cfg)
    state0 = odometry.init_state(cfg)


@jax.jit
def run(s, xs):
    return jax.lax.scan(step, s, xs)


out = run(state0, scans_in)
_ = float(jnp.sum(out[0].current.t))
import shutil
shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
with jax.profiler.trace("/tmp/jaxtrace"):
    out = run(state0, scans_in)
    _ = float(jnp.sum(out[0].current.t))

pb = glob.glob("/tmp/jaxtrace/**/*.xplane.pb", recursive=True)[0]
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs_ = xplane_pb2.XSpace()
xs_.ParseFromString(open(pb, "rb").read())
lanes = max(B, 1)
for p in xs_.planes:
    if p.name != "/device:TPU:0":
        continue
    em = p.event_metadata
    for l in p.lines:
        if l.name != "XLA Ops":
            continue
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for e in l.events:
            name = em[e.metadata_id].name
            agg[name] += e.duration_ps / 1e9
            cnt[name] += 1
        total = sum(agg.values())
        print(f"XLA Ops TOTAL {total:.1f} ms ({n} scans x {lanes} lanes -> "
              f"{total/n/lanes:.2f} ms/lane-scan busy)")
        for nm, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
            print(f"  {ms/n/lanes:7.3f} ms/lane-scan n={cnt[nm]:5d} {nm[:95]}")
