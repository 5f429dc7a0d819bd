"""Command-line runner — the framework's L4 layer.

Where the reference exposes a ROS 2 node (subscribe /lidar_points, publish
/odometry + TF + debug clouds, reference src/lidar_odometry_node.cpp), this
standalone framework exposes a CLI that replays data sources through the
same pipeline and writes the same outputs as files:

  python -m lidar_odometry_demo_tpu.cli sim --scans 100 --out traj.tum
  python -m lidar_odometry_demo_tpu.cli pcd-dir /path/to/scans --out traj.tum
  python -m lidar_odometry_demo_tpu.cli refine traj.tum --out refined.tum

Outputs: TUM trajectory (the /odometry + TF analogue), optional keyframe
cloud PCD (the /keyframe_cloud analogue), optional deskewed-scan PCDs, and
per-scan diagnostics JSON lines (the stdout telemetry analogue,
lidar_odometry.cpp:75).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np


def _load_config(args) -> "OdometryConfig":
    from lidar_odometry_demo_tpu.config import OdometryConfig

    if args.config:
        import yaml  # type: ignore

        with open(args.config) as f:
            return OdometryConfig.from_dict(yaml.safe_load(f) or {})
    return OdometryConfig()


def _run_stream(cfg, scans_iter, gt=None, out=None, keyframe_out=None, quiet=False):
    from lidar_odometry_demo_tpu.io import trajectory
    from lidar_odometry_demo_tpu.pipeline.odometry import LidarOdometry
    from lidar_odometry_demo_tpu.utils.profiling import ScanRateCounter

    odo = LidarOdometry(cfg)
    rate = ScanRateCounter()
    stamps, ts, qs = [], [], []
    for i, s in enumerate(scans_iter):
        t0 = time.perf_counter()
        diag = odo.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        dt = time.perf_counter() - t0
        t, q = odo.get_current_pose()
        stamp = s.get("stamp", i * 0.1)
        stamps.append(stamp)
        ts.append(t)
        qs.append(q)
        if not quiet:
            print(json.dumps({
                "scan": i,
                "stamp": stamp,
                "t": [round(float(x), 4) for x in t],
                "processing_ms": round(1e3 * dt, 1),  # lidar_odometry.cpp:75 analogue
                "scans_per_sec": round(rate.tick(), 2),
                "icp_iterations": int(diag.icp_iterations),
                "matches": int(diag.num_matches),
                "diverged": bool(diag.diverged),
                "map_voxels": int(diag.map_voxels),
            } | ({"window_dropped": int(diag.num_window_dropped)}
                 if diag.num_window_dropped is not None
                 and int(diag.num_window_dropped) else {})
              | ({"downsample_dropped": int(diag.num_downsample_dropped)}
                 if diag.num_downsample_dropped is not None
                 and int(diag.num_downsample_dropped) else {})
              | ({"map_saturated": True}
                 if int(diag.map_voxels) >= cfg.map_capacity else {})),
              file=sys.stderr)
    if out:
        trajectory.write_tum(out, stamps, ts, qs)
        print(f"wrote {out} ({len(ts)} poses)")
    if keyframe_out:
        from lidar_odometry_demo_tpu.io import pcd

        pcd.write_pcd(keyframe_out, odo.get_keyframe_cloud())
        print(f"wrote {keyframe_out}")
    if gt is not None and len(ts) > 1:
        est = np.asarray(ts)
        ate = trajectory.ate_rmse(est, gt[: len(est)], align=True)
        print(f"aligned ATE RMSE vs ground truth: {ate:.4f} m")
    return np.asarray(ts), np.asarray(qs)


def cmd_sim(args):
    from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
    from scipy.spatial.transform import Rotation

    cfg = _load_config(args)
    drive = simulate_sequence(
        num_scans=args.scans, width=cfg.scan_width, seed=args.seed,
        speed=args.speed, yaw_rate=args.yaw_rate,
    )
    g0_R = Rotation.from_quat(
        [drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]]
    )
    gt_rel = g0_R.inv().apply(drive.gt_t - drive.gt_t[0])
    _run_stream(cfg, drive.scans, gt=gt_rel, out=args.out,
                keyframe_out=args.keyframe_out, quiet=args.quiet)


def cmd_pcd_dir(args):
    from lidar_odometry_demo_tpu.io import pcd

    cfg = _load_config(args)

    def scans():
        for path in sorted(glob.glob(os.path.join(args.path, "*.pcd"))):
            d = pcd.read_pcd(path)
            n = d["x"].shape[0]
            xyz = np.stack([d["x"], d["y"], d["z"]], -1).astype(np.float32)
            yield dict(
                xyz=xyz,
                intensity=d.get("intensity", np.zeros(n, np.float32)),
                ring=d.get("ring", np.zeros(n, np.int32)).astype(np.int32),
                time=d.get("time", d.get("t", np.linspace(0, 0.1, n))).astype(np.float32),
            )

    _run_stream(cfg, scans(), out=args.out, keyframe_out=args.keyframe_out,
                quiet=args.quiet)


def cmd_fleet(args):
    """Batched multi-sequence odometry over the local device mesh — the
    production serving shape (BASELINE config 4)."""
    import jax
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
    from lidar_odometry_demo_tpu.io import trajectory
    from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
    from lidar_odometry_demo_tpu.parallel import batched, mesh as mesh_lib

    cfg = _load_config(args)
    n_dev = len(jax.devices())
    dp = min(args.batch, n_dev) if args.dp is None else args.dp
    sp = args.sp
    mesh = mesh_lib.make_mesh(dp=dp, sp=sp)
    print(f"mesh: dp={dp} x sp={sp} over {n_dev} devices", file=sys.stderr)

    drives = [
        simulate_sequence(num_scans=args.scans, width=cfg.scan_width,
                          seed=args.seed + b, speed=args.speed,
                          yaw_rate=0.03 * (b + 1))
        for b in range(args.batch)
    ]

    def stack(drive):
        scans = [
            scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
            for s in drive.scans
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    scans_b = jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *[stack(d) for d in drives])
    state_b = batched.init_batched_state(cfg, args.batch)
    run = batched.make_batched_sequence_runner(cfg, mesh)

    t0 = time.perf_counter()
    final, diags = run(state_b, scans_b)
    _ = float(jnp.sum(final.current.t))
    dt = time.perf_counter() - t0
    total = args.scans * args.batch
    print(f"fleet: {args.batch} sequences x {args.scans} scans in {dt:.1f}s "
          f"= {total/dt:.1f} scans/s (incl. compile)", file=sys.stderr)

    for b in range(args.batch):
        out = f"{args.out_prefix}{b}.tum"
        t_b = np.asarray(diags.pose.t[:, b])
        q_b = np.asarray(diags.pose.q[:, b])
        trajectory.write_tum(out, [i * 0.1 for i in range(args.scans)], t_b, q_b)
        g0 = Rotation.from_quat([
            drives[b].gt_q[0][1], drives[b].gt_q[0][2], drives[b].gt_q[0][3], drives[b].gt_q[0][0]
        ])
        gt_rel = g0.inv().apply(drives[b].gt_t - drives[b].gt_t[0])
        ate = trajectory.ate_rmse(t_b, gt_rel, align=True)
        print(f"  lane {b}: {out}  aligned ATE {ate:.3f} m")


def cmd_live(args):
    """Online odometry from live VLP16 UDP packets — the analogue of the
    reference's per-message ROS loop (lidar_odometry_node.cpp:45-108)."""
    import json as _json

    from lidar_odometry_demo_tpu.io import live, trajectory
    from lidar_odometry_demo_tpu.pipeline.odometry import LidarOdometry
    from lidar_odometry_demo_tpu.utils.profiling import ScanRateCounter

    cfg = _load_config(args)
    odo = LidarOdometry(cfg)
    rate = ScanRateCounter()
    stamps, ts, qs = [], [], []

    def on_scan(i, t, diag):
        _, q = odo.get_current_pose()
        stamps.append(i * 0.1)
        ts.append(t)
        qs.append(q)
        if not args.quiet:
            print(_json.dumps({
                "scan": i,
                "t": [round(float(x), 4) for x in t],
                "scans_per_sec": round(rate.tick(), 2),
                "icp_iterations": int(diag.icp_iterations),
                "matches": int(diag.num_matches),
                "diverged": bool(diag.diverged),
                "map_voxels": int(diag.map_voxels),
            } | ({"downsample_dropped": int(diag.num_downsample_dropped)}
                 if diag.num_downsample_dropped is not None
                 and int(diag.num_downsample_dropped) else {})
              | ({"map_saturated": True}
                 if int(diag.map_voxels) >= cfg.map_capacity else {})),
                file=sys.stderr)
        if args.out and (i + 1) % 10 == 0:  # incremental trajectory flush
            trajectory.write_tum(args.out, stamps, ts, qs)

    print(f"listening on udp://{args.host}:{args.port} "
          f"(idle timeout {args.idle_timeout}s)", file=sys.stderr)
    n = live.run_live(
        odo,
        live.udp_packets(args.host, args.port, timeout_s=args.idle_timeout),
        on_scan=on_scan, max_scans=args.max_scans,
    )
    if args.out and ts:
        trajectory.write_tum(args.out, stamps, ts, qs)
        print(f"wrote {args.out} ({len(ts)} poses)")
    print(f"processed {n} scans", file=sys.stderr)


def cmd_refine(args):
    from lidar_odometry_demo_tpu.io import trajectory
    from lidar_odometry_demo_tpu.parallel import pose_graph as pg

    stamps, t, q = trajectory.read_tum(args.traj)
    g = pg.chain_from_odometry(t, q)
    refined = pg.refine(g, iterations=args.iterations, use_schur=args.schur)
    trajectory.write_tum(args.out, stamps, np.asarray(refined.poses.t), np.asarray(refined.poses.q))
    print(f"wrote {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="lidar_odometry_demo_tpu")
    p.add_argument("--config", help="YAML config overriding OdometryConfig fields")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("sim", help="run odometry on a simulated VLP16 drive")
    ps.add_argument("--scans", type=int, default=50)
    ps.add_argument("--seed", type=int, default=0)
    ps.add_argument("--speed", type=float, default=3.0)
    ps.add_argument("--yaw-rate", type=float, default=0.05)
    ps.add_argument("--out", default="trajectory.tum")
    ps.add_argument("--keyframe-out")
    ps.add_argument("--quiet", action="store_true")
    ps.set_defaults(fn=cmd_sim)

    pp = sub.add_parser("pcd-dir", help="run odometry over a directory of PCD scans")
    pp.add_argument("path")
    pp.add_argument("--out", default="trajectory.tum")
    pp.add_argument("--keyframe-out")
    pp.add_argument("--quiet", action="store_true")
    pp.set_defaults(fn=cmd_pcd_dir)

    pf = sub.add_parser("fleet", help="batched multi-sequence odometry on the device mesh")
    pf.add_argument("--batch", type=int, default=4)
    pf.add_argument("--scans", type=int, default=20)
    pf.add_argument("--seed", type=int, default=0)
    pf.add_argument("--speed", type=float, default=3.0)
    pf.add_argument("--dp", type=int, default=None)
    pf.add_argument("--sp", type=int, default=1)
    pf.add_argument("--out-prefix", default="fleet_")
    pf.set_defaults(fn=cmd_fleet)

    pl = sub.add_parser("live", help="online odometry from live VLP16 UDP packets")
    pl.add_argument("--host", default="0.0.0.0")
    pl.add_argument("--port", type=int, default=2368)  # VLP16 data port
    pl.add_argument("--out", default="live_trajectory.tum")
    pl.add_argument("--idle-timeout", type=float, default=10.0,
                    help="stop after this many seconds without packets")
    pl.add_argument("--max-scans", type=int, default=None)
    pl.add_argument("--quiet", action="store_true")
    pl.set_defaults(fn=cmd_live)

    pr = sub.add_parser("refine", help="pose-graph refine a TUM trajectory")
    pr.add_argument("traj")
    pr.add_argument("--out", default="refined.tum")
    pr.add_argument("--iterations", type=int, default=10)
    pr.add_argument("--schur", action="store_true")
    pr.set_defaults(fn=cmd_refine)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
