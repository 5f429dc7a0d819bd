"""Pallas kernels vs their XLA formulations.

Interpret mode here (CPU fabric); the same kernel is wired into the ICP
loop behind config.icp_use_pallas and compiled for real on the TPU by
scripts/pallas_match_bench.py (on/off chip timing recorded in DESIGN.md
"Pallas status").
"""

import numpy as np
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.pallas.correspondence import match_rows


def _make_candidates(rng, Q, K, n_cols=9):
    """Build raw candidate rows (Q, 9, 3*RW) in the planar lane layout
    plus the dense reference arrays they encode."""
    RW, _, _ = vm._lanes(K)
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    pts = (q[:, None, None, None, :]
           + rng.normal(0, 0.25, (Q, n_cols, 3, K, 3))).astype(np.float32)
    cnt = rng.integers(0, K + 1, (Q, n_cols, 3)).astype(np.int32)
    n_present = rng.integers(0, 4, (Q, n_cols)).astype(np.int32)
    rows = np.zeros((Q, n_cols, 3, RW), np.float32)
    rows[..., 0:K] = pts[..., 0]
    rows[..., K:2 * K] = pts[..., 1]
    rows[..., 2 * K:3 * K] = pts[..., 2]
    rows[..., 3 * K] = cnt.astype(np.float32)
    rows_i32 = rows.reshape(Q, n_cols, 3 * RW).view(np.int32)
    return q, rows_i32, n_present, pts, cnt


def _xla_reference(q, pts, cnt, n_present, K, max_d2):
    Q = q.shape[0]
    d2 = np.sum((pts - q[:, None, None, None, :]) ** 2, axis=-1)  # (Q,9,3,K)
    ok = ((np.arange(3)[None, None, :] < n_present[..., None])[..., None]
          & (np.arange(K)[None, None, None, :] < cnt[..., None]))
    gated = np.where(ok & (d2 < max_d2), d2, max_d2).reshape(Q, 27 * K)
    best = np.argmin(gated, axis=-1)  # first minimum
    qi = np.arange(Q)
    flat_pts = pts.reshape(Q, 27 * K, 3)
    return flat_pts[qi, best], best, gated[qi, best]


def test_match_rows_matches_xla(rng):
    Q, K = 512, 20
    max_d2 = 0.09
    q, rows, n_present, pts, cnt = _make_candidates(rng, Q, K)
    o, i, d = match_rows(
        jnp.asarray(q), jnp.asarray(rows), jnp.asarray(n_present),
        max_d2=max_d2, max_points=K, tile=128, interpret=True,
    )
    eo, ei, ed = _xla_reference(q, pts, cnt, n_present, K, max_d2)
    np.testing.assert_allclose(np.asarray(d), ed, atol=1e-6)
    valid = ed < max_d2
    assert valid.sum() > 50  # the fixture exercises real matches
    # exact first-min tie-breaking: winning index identical where valid
    np.testing.assert_array_equal(np.asarray(i)[valid], ei[valid])
    np.testing.assert_allclose(np.asarray(o)[valid], eo[valid], atol=1e-6)


def test_match_rows_no_valid_candidate(rng):
    Q, K = 128, 20
    q, rows, n_present, pts, cnt = _make_candidates(rng, Q, K)
    q = q + 100.0  # every candidate far beyond the gate
    o, i, d = match_rows(
        jnp.asarray(q), jnp.asarray(rows), jnp.asarray(n_present),
        max_d2=0.09, max_points=K, tile=128, interpret=True,
    )
    # every query invalid: best_d2 == max_d2 exactly
    np.testing.assert_allclose(np.asarray(d), 0.09, atol=1e-7)


def test_match_candidates_pallas_flag_matches_xla(rng):
    """The wired path: vm.match_candidates(use_pallas=True, interpret via
    CPU monkeypatch) == the XLA path on a realistic candidate cache."""
    import functools
    from unittest import mock

    from lidar_odometry_demo_tpu.io.simulator import sample_structured_cloud
    from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

    xyz, nrm = sample_structured_cloud(seed=4, n_per_plane=400)
    pts = PointsWithNormals(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        valid=jnp.ones(xyz.shape[0], bool))
    m = vm.map_init(8192, 20)
    m = vm.map_insert(m, pts, voxel_size=0.2)
    index = vm.build_search_index(m)
    q = jnp.asarray(xyz[:512] + rng.normal(0, 0.05, (512, 3)).astype(np.float32))
    qv = jnp.ones(512, bool)
    t0 = jnp.zeros(3, jnp.float32)
    R0 = jnp.eye(3, dtype=jnp.float32)
    cand = vm.gather_candidates(m, index, q, qv, t0, R0, voxel_size=0.2)

    ref = vm.match_candidates(m, cand, q, qv, t0, R0, max_distance=0.3)
    with mock.patch(
        "lidar_odometry_demo_tpu.ops.pallas.correspondence.match_rows",
        functools.partial(
            __import__(
                "lidar_odometry_demo_tpu.ops.pallas.correspondence",
                fromlist=["match_rows"],
            ).match_rows,
            interpret=True,
        ),
    ):
        got = vm.match_candidates(m, cand, q, qv, t0, R0, max_distance=0.3,
                                  use_pallas=True)
    assert int(np.asarray(ref.valid).sum()) > 100
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(got.plane_origin), np.asarray(ref.plane_origin), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.plane_normal), np.asarray(ref.plane_normal), atol=1e-6)
