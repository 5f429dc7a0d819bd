"""Spatially-partitioned keyframe map (parallel/spatial.py) on the 8-device
CPU fabric.

The reference's keyframe map is one shared-memory hash grid
(src/voxel_grid.h); the sharded build must reproduce its 27-neighborhood
search semantics (voxel_grid.h:164-204) exactly while holding only 1/N of
the map per device. Tests:

- ownership is a partition (every column exactly one owner),
- sharded insert partitions the replicated voxel set exactly,
- the halo-view correspondence search merged across owners is
  BIT-IDENTICAL to the replicated search,
- the full spatially-sharded pipeline tracks the single-device pipeline.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lidar_odometry_demo_tpu.config import TINY
from lidar_odometry_demo_tpu.io.simulator import sample_structured_cloud, simulate_sequence
from lidar_odometry_demo_tpu.ops import se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals, scan_from_numpy
from lidar_odometry_demo_tpu.parallel import mesh as mesh_lib
from lidar_odometry_demo_tpu.parallel import spatial
from lidar_odometry_demo_tpu.pipeline import odometry

VSIZE = 0.2
N = 4


def _cloud(seed=5, n=3000):
    rng = np.random.default_rng(seed)
    xyz, nrm = sample_structured_cloud(seed=seed, n_per_plane=n // 7)
    keep = rng.permutation(xyz.shape[0])[:n]
    return xyz[keep], nrm[keep]


def _queries(xyz, seed=9, q=512):
    rng = np.random.default_rng(seed)
    sel = rng.permutation(xyz.shape[0])[:q]
    return (xyz[sel] + rng.normal(0, 0.05, (q, 3))).astype(np.float32)


def test_sharded_search_matches_replicated_exactly():
    xyz, nrm = _cloud()
    q_xyz = _queries(xyz)
    pts = PointsWithNormals(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        valid=jnp.ones(xyz.shape[0], bool),
    )
    qj = jnp.asarray(q_xyz)
    t0 = jnp.zeros(3, jnp.float32)
    R0 = jnp.eye(3, dtype=jnp.float32)

    # replicated reference path
    m_rep = vm.map_init(8192, 20)
    m_rep = vm.map_update(m_rep, pts, jnp.zeros(3), voxel_size=VSIZE,
                          radius=80.0, origin_quantum=N)
    idx_rep = vm.build_search_index(m_rep)
    corr_rep = vm.find_correspondences_indexed(
        m_rep, idx_rep, qj, jnp.ones(qj.shape[0], bool), t0, R0,
        voxel_size=VSIZE, max_distance=0.3)

    mesh = mesh_lib.make_mesh(dp=1, sp=N)

    def shard_fn(pts_in, q_in):
        m = vm.map_init(8192 // N, 20)
        own = spatial.owner_mask(pts_in.xyz, m.origin, VSIZE, "sp")
        mine = pts_in._replace(valid=pts_in.valid & own)
        m = vm.map_update(m, mine, jnp.zeros(3), voxel_size=VSIZE,
                          radius=80.0, origin_quantum=N)
        idx = vm.build_search_index(m)
        view = spatial.build_halo_view(m, idx, "sp")
        q_own = spatial.owner_mask(q_in, m.origin, VSIZE, "sp")
        corr = vm.find_correspondences_indexed(
            view.m, view.index, q_in, q_own, t0, R0,
            voxel_size=VSIZE, max_distance=0.3)
        size = vm.map_size(m)
        keys = m.keys
        out = jax.tree.map(lambda x: x[None], corr)
        return out, q_own[None], size[None], keys[None]

    f = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P("sp"), P("sp"), P("sp"), P("sp")), check_vma=False))
    corr_sh, q_own, sizes, keys_sh = f(pts, qj)

    q_own = np.asarray(q_own)          # (N, Q)
    # ownership is a partition: every query owned exactly once
    assert (q_own.sum(axis=0) == 1).all()

    # sharded insert partitions the voxel set exactly
    keys_sh = np.asarray(keys_sh)
    live = [set(k[k != np.int32(0x7FFFFFFF)].tolist()) for k in keys_sh]
    union = set().union(*live)
    assert sum(len(s) for s in live) == len(union)  # disjoint
    rep_keys = np.asarray(m_rep.keys)
    rep_live = set(rep_keys[rep_keys != np.int32(0x7FFFFFFF)].tolist())
    assert union == rep_live
    assert int(np.asarray(sizes).sum()) == int(vm.map_size(m_rep))

    # merge each query's result from its owner; must equal replicated
    owner = np.argmax(q_own, axis=0)   # (Q,)
    qi = np.arange(owner.shape[0])
    for field in ("valid", "plane_origin", "plane_normal"):
        got = np.asarray(getattr(corr_sh, field))[owner, qi]
        want = np.asarray(getattr(corr_rep, field))
        np.testing.assert_array_equal(got, want, err_msg=field)


def test_cached_candidate_path_matches_replicated_exactly():
    """gather_candidates + match_candidates on the halo view == replicated."""
    xyz, nrm = _cloud(seed=11)
    q_xyz = _queries(xyz, seed=12)
    pts = PointsWithNormals(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        valid=jnp.ones(xyz.shape[0], bool),
    )
    qj = jnp.asarray(q_xyz)
    t0 = jnp.zeros(3, jnp.float32)
    R0 = jnp.eye(3, dtype=jnp.float32)

    m_rep = vm.map_init(8192, 20)
    m_rep = vm.map_update(m_rep, pts, jnp.zeros(3), voxel_size=VSIZE,
                          radius=80.0, origin_quantum=N)
    idx_rep = vm.build_search_index(m_rep)
    cand_rep = vm.gather_candidates(
        m_rep, idx_rep, qj, jnp.ones(qj.shape[0], bool), t0, R0,
        voxel_size=VSIZE)
    corr_rep = vm.match_candidates(
        m_rep, cand_rep, qj, jnp.ones(qj.shape[0], bool), t0, R0,
        max_distance=0.3)

    mesh = mesh_lib.make_mesh(dp=1, sp=N)

    def shard_fn(pts_in, q_in):
        m = vm.map_init(8192 // N, 20)
        own = spatial.owner_mask(pts_in.xyz, m.origin, VSIZE, "sp")
        m = vm.map_update(m, pts_in._replace(valid=pts_in.valid & own),
                          jnp.zeros(3), voxel_size=VSIZE, radius=80.0,
                          origin_quantum=N)
        idx = vm.build_search_index(m)
        view = spatial.build_halo_view(m, idx, "sp")
        q_own = spatial.owner_mask(q_in, m.origin, VSIZE, "sp")
        cand = vm.gather_candidates(view.m, view.index, q_in, q_own, t0, R0,
                                    voxel_size=VSIZE)
        corr = vm.match_candidates(view.m, cand, q_in, q_own, t0, R0,
                                   max_distance=0.3)
        return jax.tree.map(lambda x: x[None], corr), q_own[None]

    f = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P("sp"), P("sp")), check_vma=False))
    corr_sh, q_own = f(pts, qj)

    q_own = np.asarray(q_own)
    assert (q_own.sum(axis=0) == 1).all()
    owner = np.argmax(q_own, axis=0)
    qi = np.arange(owner.shape[0])
    for field in ("valid", "plane_origin", "plane_normal"):
        got = np.asarray(getattr(corr_sh, field))[owner, qi]
        want = np.asarray(getattr(corr_rep, field))
        np.testing.assert_array_equal(got, want, err_msg=field)


def test_spatial_pipeline_tracks_single_device():
    """Full spatially-sharded pipeline (map in N column shards, halo
    exchange per scan, psum'd normal equations) vs the plain single-device
    pipeline on the same drive: trajectories agree to float-reduction
    tolerance, and per-device map shards stay within capacity."""
    cfg = TINY
    n_scans = 5
    drive = simulate_sequence(num_scans=n_scans, width=cfg.scan_width, seed=3,
                              speed=2.0, yaw_rate=0.05)
    scans = [
        scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                        cfg.max_raw_points)
        for s in drive.scans
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)

    mesh = mesh_lib.make_mesh(dp=1, sp=N)
    run = spatial.make_spatial_sequence_runner(cfg, mesh, axis="sp")
    state_sh = spatial.init_spatial_state(cfg, N)
    final_sh, diags_sh = run(state_sh, stacked)

    single = odometry.LidarOdometry(cfg)
    for s in scans:
        single.process_scan(s)

    t_sh = np.asarray(final_sh.current.t)  # (N, 3) — identical per shard
    assert np.abs(t_sh - t_sh[0][None]).max() < 1e-6
    t_single = np.asarray(single.state.current.t)
    assert np.abs(t_sh[0] - t_single).max() < 1e-3, (t_sh[0], t_single)

    # matching ran with real correspondences
    assert int(np.asarray(diags_sh.num_matches)[-1]) > 0
    # the shards really partition the map: each holds a fraction
    sizes = np.asarray(
        jnp.sum((final_sh.keyframe.keys != np.int32(0x7FFFFFFF)), axis=-1)
    )
    total = sizes.sum()
    assert total > 100
    assert (sizes < cfg.map_capacity // N).all()
    assert sizes.max() < total  # genuinely distributed, no shard holds all


def test_batched_spatial_mesh_runs_two_sequences():
    """The full production mesh: dp=2 independent sequences x sp=4 map
    shards on the 8-device fabric. Each dp lane must reproduce its own
    single-device trajectory while its map lives in 4 column shards."""
    cfg = TINY
    n_scans = 4
    drives = [
        simulate_sequence(num_scans=n_scans, width=cfg.scan_width, seed=s,
                          speed=2.0, yaw_rate=0.05)
        for s in (3, 17)
    ]
    lanes = []
    for d in drives:
        scans = [
            scan_from_numpy(s["xyz"], s["intensity"], s["ring"], s["time"],
                            cfg.max_raw_points)
            for s in d.scans
        ]
        lanes.append(jax.tree.map(lambda *xs: jnp.stack(xs), *scans))
    scans_sh = jax.tree.map(lambda a, b: jnp.stack([a, b], axis=1), *lanes)

    mesh = mesh_lib.make_mesh(dp=2, sp=4)
    run = spatial.make_batched_spatial_sequence_runner(cfg, mesh)
    state0 = spatial.init_batched_spatial_state(cfg, dp=2, sp=4)
    final, diags = run(state0, scans_sh)

    assert np.asarray(diags.num_matches)[-1].min() > 0
    t_lanes = np.asarray(final.current.t)  # (2, 4, 3)
    # shards within a lane agree bitwise-ish; lanes differ (different drives)
    assert np.abs(t_lanes - t_lanes[:, :1]).max() < 1e-6
    for li, d in enumerate(drives):
        single = odometry.LidarOdometry(cfg)
        for s in d.scans:
            single.process_cloud(s["xyz"], s["intensity"], s["ring"], s["time"])
        t1 = np.asarray(single.state.current.t)
        assert np.abs(t_lanes[li, 0] - t1).max() < 1e-3, (li, t_lanes[li, 0], t1)
