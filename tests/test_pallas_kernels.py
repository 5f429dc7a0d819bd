"""Pallas kernels vs their XLA formulations.

Interpret mode here (CPU fabric); the same kernel is wired into the ICP
loop behind config.icp_use_pallas and compiled for real on the TPU by
scripts/pallas_match_bench.py (timing recorded in DESIGN.md).
"""

import numpy as np
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops.pallas.correspondence import reduce_candidates


def _xla_reference(q_world, cand_pts, cand_ok, max_d2):
    d2 = np.sum((cand_pts - q_world[:, None, :]) ** 2, axis=-1)
    gated = np.where(cand_ok & (d2 < max_d2), d2, max_d2)
    best = np.argmin(gated, axis=-1)  # first minimum
    qi = np.arange(gated.shape[0])
    return cand_pts[qi, best], best, gated[qi, best]


def test_reduce_candidates_matches_xla(rng):
    Q, C = 512, 54
    max_d2 = 0.09
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    # candidates clustered near queries so some pass the gate
    cand = (q[:, None, :] + rng.normal(0, 0.3, (Q, C, 3))).astype(np.float32)
    ok = rng.random((Q, C)) < 0.7

    o, i, d = reduce_candidates(
        jnp.asarray(q), jnp.asarray(cand), jnp.asarray(ok),
        max_d2=max_d2, tile=128, interpret=True,
    )
    eo, ei, ed = _xla_reference(q, cand, ok, max_d2)
    np.testing.assert_allclose(np.asarray(d), ed, atol=1e-6)
    valid = ed < max_d2
    # exact first-min tie-breaking: winning index identical where valid
    np.testing.assert_array_equal(np.asarray(i)[valid], ei[valid])
    np.testing.assert_allclose(np.asarray(o)[valid], eo[valid], atol=1e-6)


def test_reduce_candidates_no_valid_candidate(rng):
    Q, C = 128, 8
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    cand = (q[:, None, :] + 10.0).astype(np.float32)  # all far
    ok = np.ones((Q, C), bool)
    o, i, d = reduce_candidates(
        jnp.asarray(q), jnp.asarray(cand), jnp.asarray(ok),
        max_d2=0.09, tile=128, interpret=True,
    )
    # every query invalid: best_d2 == max_d2 exactly
    np.testing.assert_allclose(np.asarray(d), 0.09, atol=1e-7)


def test_match_candidates_pallas_flag_matches_xla(rng):
    """The wired path: vm.match_candidates(use_pallas=True, interpret via
    CPU monkeypatch) == the XLA path on a realistic candidate cache."""
    import functools
    from unittest import mock

    from lidar_odometry_demo_tpu.io.simulator import sample_structured_cloud
    from lidar_odometry_demo_tpu.ops import voxel_map as vm
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
        "lidar_odometry_demo_tpu.ops.pallas.correspondence.reduce_candidates",
        functools.partial(
            __import__(
                "lidar_odometry_demo_tpu.ops.pallas.correspondence",
                fromlist=["reduce_candidates"],
            ).reduce_candidates,
            interpret=True,
        ),
    ):
        got = vm.match_candidates(m, cand, q, qv, t0, R0, max_distance=0.3,
                                  use_pallas=True)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(got.plane_origin), np.asarray(ref.plane_origin), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.plane_normal), np.asarray(ref.plane_normal), atol=1e-6)
