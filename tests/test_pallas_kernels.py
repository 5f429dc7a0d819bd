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


def test_jtwj_accumulate_matches_xla(rng):
    """Fused residual/Jacobian/Hessian kernel == the XLA normal-equation
    formulation (without the translation prior) on a realistic system."""
    from scipy.spatial.transform import Rotation

    from lidar_odometry_demo_tpu.ops.pallas.jtwj import jtwj_accumulate

    Q = 2048
    sl = rng.uniform(-20, 20, (Q, 3)).astype(np.float32)
    pn = rng.normal(0, 1, (Q, 3)).astype(np.float32)
    pn /= np.linalg.norm(pn, axis=1, keepdims=True)
    R = Rotation.from_euler("xyz", [0.02, -0.01, 0.3]).as_matrix().astype(np.float32)
    t = np.array([1.5, -0.2, 0.1], np.float32)
    # plane origins near the transformed points -> realistic cm residuals
    po = (sl @ R.T + t + rng.normal(0, 0.03, (Q, 3))).astype(np.float32)
    valid = rng.random(Q) < 0.8
    delta = 0.15

    H, b = jtwj_accumulate(
        jnp.asarray(sl), jnp.asarray(po), jnp.asarray(pn),
        jnp.asarray(valid), jnp.asarray(R), jnp.asarray(t),
        huber_delta=delta, tile=512, interpret=True,
    )

    # XLA/numpy reference (mirrors icp._normal_equations without prior)
    rp = sl @ R.T
    r = np.sum((rp + t - po) * pn, axis=-1)
    absr = np.abs(r)
    w = np.where(absr <= delta, 1.0, delta / np.maximum(absr, 1e-30))
    w = np.where(valid, w, 0.0)
    J = np.concatenate([np.cross(rp, pn), pn], axis=-1)
    Jw = J * w[:, None]
    np.testing.assert_allclose(np.asarray(H), J.T @ Jw, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), Jw.T @ r, rtol=2e-5, atol=1e-4)


def test_icp_pallas_jtwj_flag_matches_xla(rng):
    """align() with icp_use_pallas_jtwj (interpret mode on CPU) produces
    the same pose as the XLA path."""
    import functools
    from unittest import mock

    import jax

    from lidar_odometry_demo_tpu.config import TINY
    from lidar_odometry_demo_tpu.io.simulator import sample_structured_cloud
    from lidar_odometry_demo_tpu.ops import icp, se3
    from lidar_odometry_demo_tpu.ops import voxel_map as vm
    from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

    xyz, nrm = sample_structured_cloud(seed=11, n_per_plane=400)
    pts = PointsWithNormals(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
        valid=jnp.ones(xyz.shape[0], bool))
    m = vm.map_init(8192, 20)
    m = vm.map_insert(m, pts, voxel_size=0.2)
    n_q = TINY.max_match_points
    q = jnp.asarray(xyz[:n_q] + rng.normal(0, 0.02, (n_q, 3)).astype(np.float32))
    qv = jnp.ones(n_q, bool)
    guess = se3.Pose.identity()

    cfg_x = TINY
    res_x = icp.make_align(cfg_x)(m, q, qv, guess)

    cfg_p = TINY.replace(icp_use_pallas_jtwj=True)
    import lidar_odometry_demo_tpu.ops.pallas.jtwj as jt

    with mock.patch.object(
        jt, "jtwj_accumulate",
        functools.partial(jt.jtwj_accumulate, tile=TINY.max_match_points,
                          interpret=True),
    ):
        res_p = icp.make_align(cfg_p)(m, q, qv, guess)

    np.testing.assert_allclose(
        np.asarray(res_p.pose.t), np.asarray(res_x.pose.t), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res_p.pose.q), np.asarray(res_x.pose.q), atol=1e-6)
