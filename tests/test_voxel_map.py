"""Voxel map vs dict-based reference-semantics oracle.

Covers the reference's VoxelGrid tests (test/test.cpp:26-75 UniquePoints /
DuplicatePoints) plus capped-insert, eviction, rebase, and correspondence
search — which the reference leaves untested (SURVEY.md §4 "Untested").
"""

import numpy as np
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals
from lidar_odometry_demo_tpu.oracle.reference_semantics import DictVoxelGrid


def _pts(xyz, normals=None, capacity=None):
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    cap = capacity or n
    normals = np.asarray(normals, np.float32) if normals is not None else np.zeros_like(xyz)
    pad = cap - n
    return PointsWithNormals(
        xyz=jnp.asarray(np.concatenate([xyz, np.zeros((pad, 3), np.float32)])),
        normal=jnp.asarray(np.concatenate([normals, np.zeros((pad, 3), np.float32)])),
        valid=jnp.asarray(np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])),
    )


def _stored_set(m: vm.VoxelMap):
    pts, nrm = vm.get_cloud(m)
    return {tuple(np.round(p, 5)) for p in pts}


def test_unique_points():
    # reference test.cpp:26-55 — 7 points in distinct voxels all retained
    xyz = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (-1, 0, 0), (0, -1, 0), (0, 0, -1)]
    m = vm.map_init(64, 1)
    m = vm.map_insert(m, _pts(xyz, capacity=16), voxel_size=0.5)
    assert int(vm.map_size(m)) == 7
    assert _stored_set(m) == {tuple(np.float32(p) for p in q) for q in xyz}


def test_duplicate_points():
    # reference test.cpp:57-75 — max_points=1 dedupes to 2 survivors
    xyz = [(0, 0, 0), (1, 0, 0), (0, 0, 0), (1, 0, 0)]
    m = vm.map_init(64, 1)
    m = vm.map_insert(m, _pts(xyz, capacity=8), voxel_size=0.5)
    assert int(vm.map_size(m)) == 2
    assert _stored_set(m) == {(0.0, 0.0, 0.0), (1.0, 0.0, 0.0)}


def test_truncation_quirk_origin_merge():
    # (int)(x/voxel) truncates toward zero: +/-0.4 at voxel 0.5 all quantize
    # to index 0 -> the 8 voxels around the origin merge (voxel_grid.h:70-75)
    xyz = [(0.4, 0.4, 0.4), (-0.4, -0.4, -0.4), (0.4, -0.4, 0.4)]
    m = vm.map_init(64, 10)
    m = vm.map_insert(m, _pts(xyz, capacity=4), voxel_size=0.5)
    assert int(vm.map_size(m)) == 1
    assert int(m.count[np.asarray(m.keys) != np.asarray(vm.EMPTY_KEY)][0]) == 3


def test_capped_insert_first_come_kept(rng):
    cap = 3
    # all in voxel (10,10,10) at voxel_size 0.5: coords in [5.01, 5.49)
    xyz = rng.uniform(0.01, 0.49, (10, 3)).astype(np.float32) + 5.0
    m = vm.map_init(64, cap)
    m = vm.map_insert(m, _pts(xyz, capacity=16), voxel_size=0.5)
    assert int(vm.map_size(m)) == 1
    pts, _ = vm.get_cloud(m)
    assert pts.shape[0] == cap
    np.testing.assert_allclose(pts, xyz[:cap], atol=1e-6)  # first 3 kept in order


def test_incremental_insert_matches_oracle(rng):
    oracle = DictVoxelGrid(0.3, 4)
    m = vm.map_init(1024, 4)
    for _ in range(5):
        batch = rng.uniform(-4, 4, (100, 3)).astype(np.float32)
        nrm = rng.normal(size=(100, 3)).astype(np.float32)
        oracle.add_cloud(batch, nrm)
        m = vm.map_insert(m, _pts(batch, nrm, capacity=128), voxel_size=0.3)
    assert int(vm.map_size(m)) == oracle.size()
    ours_p, ours_n = vm.get_cloud(m)
    oracle_p, oracle_n = oracle.get_cloud()
    # same multisets of stored points & normals
    def key(arr):
        return sorted(map(tuple, np.round(arr, 5)))
    assert key(ours_p) == key(oracle_p)
    assert key(ours_n) == key(oracle_n)


def test_radius_cleanup_matches_oracle(rng):
    oracle = DictVoxelGrid(0.4, 2)
    m = vm.map_init(2048, 2)
    batch = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    oracle.add_cloud(batch)
    m = vm.map_insert(m, _pts(batch, capacity=512), voxel_size=0.4)
    center = np.array([3.0, -2.0, 1.0], np.float32)
    oracle.radius_cleanup(center, 10.0)
    m = vm.radius_cleanup(m, jnp.asarray(center), radius=10.0, voxel_size=0.4)
    assert int(vm.map_size(m)) == oracle.size()
    ours_p, _ = vm.get_cloud(m)
    oracle_p, _ = oracle.get_cloud()
    assert sorted(map(tuple, np.round(ours_p, 5))) == sorted(map(tuple, np.round(oracle_p, 5)))


def test_rebase_preserves_lookup(rng):
    """After cleanup re-bases the origin, stored voxels must still be found."""
    m = vm.map_init(1024, 4)
    batch = rng.uniform(-5, 5, (200, 3)).astype(np.float32) + np.array([40, 0, 0], np.float32)
    m = vm.map_insert(m, _pts(batch, capacity=256), voxel_size=0.5)
    n_before = int(vm.map_size(m))
    # move the center near the cluster: nothing evicted, origin shifts
    m2 = vm.radius_cleanup(m, jnp.asarray([40.0, 0.0, 0.0]), radius=80.0, voxel_size=0.5)
    assert int(vm.map_size(m2)) == n_before
    assert np.asarray(m2.origin).tolist() == [80, 0, 0]
    # each original point must still produce a valid self-correspondence
    corr = vm.find_correspondences(
        m2, jnp.asarray(batch), jnp.ones(batch.shape[0], bool),
        jnp.zeros(3), jnp.eye(3), voxel_size=0.5, max_distance=0.1,
    )
    assert bool(jnp.all(corr.valid))
    np.testing.assert_allclose(np.asarray(corr.plane_origin), batch, atol=1e-5)


def test_rebase_far_from_world_origin(rng):
    """Maps a kilometre from the world origin still work after rebase: the
    31-bit key window is relative to the rebased origin, not the world."""
    center = np.array([1000.0, -500.0, 3.0], np.float32)
    m = vm.map_init(1024, 4)
    # rebase the empty map to the far center first (as cleanup does each scan)
    m = vm.radius_cleanup(m, jnp.asarray(center), radius=80.0, voxel_size=0.5)
    batch = (rng.uniform(-5, 5, (200, 3)) + center).astype(np.float32)
    m = vm.map_insert(m, _pts(batch, capacity=256), voxel_size=0.5)
    assert int(vm.map_size(m)) > 100
    corr = vm.find_correspondences(
        m, jnp.asarray(batch), jnp.ones(batch.shape[0], bool),
        jnp.zeros(3), jnp.eye(3), voxel_size=0.5, max_distance=0.1,
    )
    assert bool(jnp.all(corr.valid))
    np.testing.assert_allclose(np.asarray(corr.plane_origin), batch, atol=1e-4)


def test_correspondence_matches_oracle(rng):
    voxel = 0.3
    oracle = DictVoxelGrid(voxel, 5)
    m = vm.map_init(2048, 5)
    stored = rng.uniform(-3, 3, (300, 3)).astype(np.float32)
    nrm = rng.normal(size=(300, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    oracle.add_cloud(stored, nrm)
    m = vm.map_insert(m, _pts(stored, nrm, capacity=512), voxel_size=voxel)

    queries = rng.uniform(-3.5, 3.5, (64, 3)).astype(np.float32)
    corr = vm.find_correspondences(
        m, jnp.asarray(queries), jnp.ones(64, bool), jnp.zeros(3), jnp.eye(3),
        voxel_size=voxel, max_distance=0.3,
    )
    for i in range(64):
        expect = oracle.get_correspondence(queries[i], 0.3 * 0.3)
        assert bool(corr.valid[i]) == (expect is not None), i
        if expect is not None:
            np.testing.assert_allclose(np.asarray(corr.plane_origin[i]), expect[0], atol=1e-5)
            np.testing.assert_allclose(np.asarray(corr.plane_normal[i]), expect[1], atol=1e-5)


def test_correspondence_respects_pose(rng):
    """findMatchingPairs transforms queries by the pose first (voxel_grid.h:217-223)."""
    from lidar_odometry_demo_tpu.ops import se3

    voxel = 0.3
    stored = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
    m = vm.map_init(1024, 3)
    m = vm.map_insert(m, _pts(stored, capacity=128), voxel_size=voxel)
    q = se3.quat_from_axis_angle(jnp.asarray([0.0, 0, 1.0], jnp.float32), 0.3)
    t = jnp.asarray([0.5, -0.2, 0.1], jnp.float32)
    R = se3.quat_to_matrix(q)
    # local queries = stored points pulled back through the pose => exact hits
    local = (stored - np.asarray(t)) @ np.asarray(R)  # R^-1 (p - t)
    corr = vm.find_correspondences(
        m, jnp.asarray(local, jnp.float32), jnp.ones(100, bool), t, R,
        voxel_size=voxel, max_distance=0.05,
    )
    assert float(jnp.mean(corr.valid.astype(jnp.float32))) > 0.95
    err = np.linalg.norm(np.asarray(corr.plane_origin) - stored, axis=-1)
    assert np.all(err[np.asarray(corr.valid)] < 0.05)


def test_downsample_matches_oracle(rng):
    xyz = rng.uniform(-2, 2, (400, 3)).astype(np.float32)
    oracle = DictVoxelGrid(0.5, 1)
    oracle.add_cloud(xyz)
    out = vm.downsample(_pts(xyz, capacity=512), voxel_size=0.5, budget=256)
    got = np.asarray(out.xyz)[np.asarray(out.valid)]
    expect, _ = oracle.get_cloud()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_downsample_budget_truncates(rng):
    xyz = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    out = vm.downsample(_pts(xyz, capacity=512), voxel_size=0.1, budget=64)
    assert int(jnp.sum(out.valid.astype(jnp.int32))) == 64


def test_downsample_overflow_counter(rng):
    # at 0.1 m voxels, 300 well-spread points occupy ~300 distinct voxels;
    # budget 64 must report the dropped leaders instead of silently losing
    # coverage (VERDICT r4 weak #5)
    xyz = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    pn = _pts(xyz, capacity=512)
    out, dropped = vm.downsample(pn, voxel_size=0.1, budget=64,
                                 with_overflow=True)
    # trunc, not floor: the reference quantizes by truncation toward zero
    # (voxel_grid.h:68-75), which vm.voxel_indices reproduces
    n_unique = len({tuple(v) for v in np.trunc(xyz / 0.1).astype(int)})
    assert int(jnp.sum(out.valid.astype(jnp.int32))) == 64
    assert int(dropped) == n_unique - 64
    # no overflow -> zero counter
    out2, dropped2 = vm.downsample(pn, voxel_size=0.1, budget=512,
                                   with_overflow=True)
    assert int(dropped2) == 0
    assert int(jnp.sum(out2.valid.astype(jnp.int32))) == n_unique


def test_table_overflow_drops_gracefully(rng):
    m = vm.map_init(16, 2)  # tiny table
    batch = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
    m = vm.map_insert(m, _pts(batch, capacity=256), voxel_size=0.2)
    assert int(vm.map_size(m)) <= 16
    # table remains sorted & consistent
    keys = np.asarray(m.keys)
    assert np.all(np.diff(keys.astype(np.int64)) >= 0)


def test_cached_candidates_match_exact_search(rng):
    """match_candidates at the gather pose == find_correspondences exactly,
    and stays consistent under small pose perturbations (the ICP use)."""
    from lidar_odometry_demo_tpu.ops import se3

    voxel = 0.3
    m = vm.map_init(2048, 5)
    stored = rng.uniform(-3, 3, (500, 3)).astype(np.float32)
    nrm = rng.normal(size=(500, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    m = vm.map_insert(m, _pts(stored, nrm, capacity=512), voxel_size=voxel)

    queries = jnp.asarray(rng.uniform(-3.5, 3.5, (128, 3)).astype(np.float32))
    valid = jnp.ones(128, bool)
    t = jnp.asarray([0.05, -0.02, 0.01], jnp.float32)
    R = jnp.eye(3)

    index = vm.build_search_index(m)
    exact = vm.find_correspondences_indexed(
        m, index, queries, valid, t, R, voxel_size=voxel, max_distance=0.3)
    cand = vm.gather_candidates(m, index, queries, valid, t, R, voxel_size=voxel)
    cached = vm.match_candidates(m, cand, queries, valid, t, R, max_distance=0.3)

    np.testing.assert_array_equal(np.asarray(exact.valid), np.asarray(cached.valid))
    np.testing.assert_allclose(
        np.asarray(exact.plane_origin), np.asarray(cached.plane_origin), atol=0)
    np.testing.assert_allclose(
        np.asarray(exact.plane_normal), np.asarray(cached.plane_normal), atol=0)

    # a few mm of pose motion (the intra-ICP regime): results still agree
    # except possibly at voxel-boundary crossings (none for this geometry)
    t2 = t + jnp.asarray([0.004, -0.003, 0.002], jnp.float32)
    exact2 = vm.find_correspondences_indexed(
        m, index, queries, valid, t2, R, voxel_size=voxel, max_distance=0.3)
    cached2 = vm.match_candidates(m, cand, queries, valid, t2, R, max_distance=0.3)
    agree = np.mean(np.asarray(exact2.valid) == np.asarray(cached2.valid))
    assert agree > 0.95, agree
