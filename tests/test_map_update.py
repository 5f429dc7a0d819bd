"""Fused map_update == radius_cleanup ∘ map_insert (semantic equivalence)."""

import numpy as np
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops import voxel_map as vm
from tests.test_voxel_map import _pts, _stored_set


def test_fused_update_matches_two_pass(rng):
    voxel, radius = 0.4, 12.0
    m_a = vm.map_init(4096, 3)
    m_b = vm.map_init(4096, 3)
    center = np.zeros(3, np.float32)
    for step in range(4):
        center = center + np.array([3.0, 1.0, 0.0], np.float32)
        batch = (rng.uniform(-15, 15, (300, 3)) + center).astype(np.float32)
        nrm = rng.normal(size=(300, 3)).astype(np.float32)
        new = _pts(batch, nrm, capacity=512)

        # two-pass reference path
        m_a = vm.radius_cleanup(m_a, jnp.asarray(center), radius=radius, voxel_size=voxel)
        m_a = vm.map_insert(m_a, new, voxel_size=voxel)
        # fused path
        m_b = vm.map_update(m_b, new, jnp.asarray(center), voxel_size=voxel, radius=radius)

        assert int(vm.map_size(m_a)) == int(vm.map_size(m_b)), step
        assert _stored_set(m_a) == _stored_set(m_b), step
        # same voxel keys relative to the same origin
        np.testing.assert_array_equal(np.asarray(m_a.origin), np.asarray(m_b.origin))
        ka = np.asarray(m_a.keys); kb = np.asarray(m_b.keys)
        np.testing.assert_array_equal(ka, kb)
        np.testing.assert_array_equal(np.asarray(m_a.count), np.asarray(m_b.count))


def test_fused_update_reuses_evicted_voxel(rng):
    """A voxel evicted and immediately re-populated in the same update must
    contain only the new points (fresh-start semantics, like the reference's
    erase-then-insert)."""
    voxel = 0.5
    m = vm.map_init(256, 4)
    old = np.array([[5.1, 5.1, 0.1], [5.2, 5.2, 0.2]], np.float32)
    m = vm.map_insert(m, _pts(old, capacity=4), voxel_size=voxel)
    # center far away evicts the old voxel; new points land in the same voxel
    new = np.array([[5.3, 5.3, 0.3]], np.float32)
    center = jnp.asarray([5.0, 5.0, 0.0], jnp.float32)
    m2 = vm.map_update(m, _pts(new, capacity=4), center, voxel_size=voxel, radius=0.1)
    pts, _ = vm.get_cloud(m2)
    assert sorted(map(tuple, np.round(pts, 4))) == [(5.3, 5.3, 0.3)]


def test_map_update_with_index_matches_searchsorted(rng):
    """The directory-lookup insert path must equal the searchsorted path
    exactly (same table state), including tombstone reuse after eviction."""
    import jax.numpy as jnp
    from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

    m = vm.map_init(4096, 5)
    for step in range(4):
        n = 600
        xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32) + step * 1.5
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        pts = PointsWithNormals(
            xyz=jnp.asarray(xyz), normal=jnp.asarray(nrm),
            valid=jnp.ones(n, bool))
        center = jnp.asarray([step * 1.5, 0.0, 0.0], jnp.float32)
        index = vm.build_search_index(m)
        a = vm.map_update(m, pts, center, voxel_size=0.2, radius=6.0)
        b = vm.map_update(m, pts, center, voxel_size=0.2, radius=6.0, index=index)
        for f in vm.VoxelMap._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f)
        m = b
