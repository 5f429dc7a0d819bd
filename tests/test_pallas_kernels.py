"""Pallas kernels vs their XLA formulations (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops.pallas.correspondence import reduce_candidates


def _xla_reference(q_world, cand_pts, cand_nrm, cand_ok, max_d2):
    d2 = np.sum((cand_pts - q_world[:, None, :]) ** 2, axis=-1)
    gated = np.where(cand_ok & (d2 < max_d2), d2, max_d2)
    best = np.argmin(gated, axis=-1)  # first minimum
    qi = np.arange(gated.shape[0])
    return cand_pts[qi, best], cand_nrm[qi, best], gated[qi, best]


def test_reduce_candidates_matches_xla(rng):
    Q, C = 512, 54
    max_d2 = 0.09
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    # candidates clustered near queries so some pass the gate
    cand = (q[:, None, :] + rng.normal(0, 0.3, (Q, C, 3))).astype(np.float32)
    nrm = rng.normal(size=(Q, C, 3)).astype(np.float32)
    ok = rng.random((Q, C)) < 0.7

    o, n, d = reduce_candidates(
        jnp.asarray(q), jnp.asarray(cand), jnp.asarray(nrm), jnp.asarray(ok),
        max_d2=max_d2, tile=128, interpret=True,
    )
    eo, en, ed = _xla_reference(q, cand, nrm, ok, max_d2)
    np.testing.assert_allclose(np.asarray(d), ed, atol=1e-6)
    valid = ed < max_d2
    np.testing.assert_allclose(np.asarray(o)[valid], eo[valid], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n)[valid], en[valid], atol=1e-6)


def test_reduce_candidates_no_valid_candidate(rng):
    Q, C = 128, 8
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    cand = (q[:, None, :] + 10.0).astype(np.float32)  # all far
    nrm = rng.normal(size=(Q, C, 3)).astype(np.float32)
    ok = np.ones((Q, C), bool)
    o, n, d = reduce_candidates(
        jnp.asarray(q), jnp.asarray(cand), jnp.asarray(nrm), jnp.asarray(ok),
        max_d2=0.09, tile=128, interpret=True,
    )
    # every query invalid: best_d2 == max_d2 exactly
    np.testing.assert_allclose(np.asarray(d), 0.09, atol=1e-7)
