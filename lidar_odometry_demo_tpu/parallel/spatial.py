"""Spatially-partitioned keyframe map with halo exchange.

The reference's keyframe `VoxelGrid` is one shared-memory hash map
(src/voxel_grid.h:17-257); its 27-neighborhood correspondence search
(voxel_grid.h:164-204) reads the 3x3x3 voxels around every query. Scaling
the map across devices (BASELINE.json north star: "spatial partitioning of
keyframe map blocks across hosts") therefore needs the boundary reads
solved. TPU-native design:

**Interleaved column ownership.** Device d of N owns every (x, y) map
column whose directory x-coordinate satisfies `gx mod N == d`. Each device
holds only its own columns in a local sorted-key `VoxelMap` of capacity
C/N — per-device map memory shrinks with the mesh.

**Rebase-stable sharding.** The sorted table's keys are relative to a
rebasable origin (voxel_map.py); an origin shift by delta changes every
column's gx by -delta_x, which would re-assign owners. The sharded
pipeline therefore quantizes the per-scan origin rebase to multiples of N
(`map_update(origin_quantum=N)`): ownership `gx mod N` is invariant, so
voxels NEVER migrate between devices — no redistribution collective
exists because none is needed.

**Halo exchange, once per scan.** A query owned by device d (its center
column `gx mod N == d`) reads neighbor columns gx-1 and gx+1, owned by
devices d-1 and d+1 (mod N). The map is frozen for the whole ICP solve
(reference semantics: correspondences re-search a fixed keyframe,
cloud_matcher.cpp:138-139), so the halo is exchanged ONCE per scan — two
`ppermute`s moving each shard's per-scan search structures (column
directory, z-occupancy descriptors, key-ordered candidate/normal rows) to
its ring neighbors — and every ICP iteration then runs entirely on-device.

**Composite map view.** The received halo blocks are fused with the local
shard into a single (3C/N)-row `VoxelMap` + `SearchIndex` whose dense
column directory selects, per cell, the block that owns that column (slot
pointers offset into the concatenated rows). Every existing search kernel
— `find_correspondences_indexed`, `gather_candidates`, `match_candidates`
— runs verbatim on the view; results are bit-identical to the replicated
path because each column resolves to exactly the rows its unique owner
stores, in the same (column scan, z, insertion) order.

The 6x6 normal equations are psum-reduced per GN iteration (ops/icp.py),
so all devices take identical pose steps; inserts are ownership-masked so
each world-frame point lands on exactly one device.
"""

from __future__ import annotations

import os as _os

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_odometry_demo_tpu.ops import se3
from lidar_odometry_demo_tpu.ops import voxel_map as vm
from lidar_odometry_demo_tpu.ops.voxel_map import (
    _G,
    _GHALF,
    _PTR_EMPTY,
    SearchIndex,
    VoxelMap,
)


_FORCE_HALO = _os.environ.get("LIDAR_FORCE_HALO", "0") == "1"


def column_gx(xyz: jax.Array, origin: jax.Array, voxel_size: float) -> jax.Array:
    """Directory x-coordinate of each point's map column (voxel_map._G grid)."""
    ix = vm.voxel_indices(xyz, voxel_size)[..., 0] - origin[0]
    return ix + _GHALF


def owner_mask(xyz: jax.Array, origin: jax.Array, voxel_size: float,
               axis: str) -> jax.Array:
    """True where this device owns the point's column (gx mod N == rank).

    Requires the origin's x to be a multiple of N (map_update
    origin_quantum=N) so the mask is stable across rebases.
    """
    n = jax.lax.axis_size(axis)
    r = jax.lax.axis_index(axis)
    return (column_gx(xyz, origin, voxel_size) % n) == r


class HaloView(NamedTuple):
    """Composite (local + ring-neighbor halos) map view for the search."""

    m: VoxelMap          # concatenated [self, next, prev] table
    index: SearchIndex   # owner-resolved dense directory + concat desc/rows


def build_halo_view(m: VoxelMap, index: SearchIndex, axis: str) -> HaloView:
    """Exchange halos with the ring neighbors and fuse a composite view.

    Two ppermutes per scan move (tab, dense, desc) from ranks r+1 and r-1
    to r; the composite dense directory selects per column the unique
    owning block, with slot pointers offset into the concatenated tables
    [self, next, prev]. A query whose center column this device owns only
    ever touches columns owned by ranks {r-1, r, r+1}, so the view is
    complete for every locally-owned query. The composite is itself a
    valid VoxelMap + SearchIndex: every search kernel runs verbatim (the
    z-triple rows are rebuilt from the concatenated table by pure slices;
    a triple never straddles blocks — within-column runs live entirely in
    their owner's block, and cross-block reads are masked absent).
    """
    n = jax.lax.axis_size(axis)
    r = jax.lax.axis_index(axis)
    S = m.capacity

    if n == 1 and not _FORCE_HALO:
        # single shard: the local view IS the complete map. LIDAR_FORCE_HALO=1
        # keeps going anyway (self-ppermutes, 3x self-composite) so the
        # halo machinery's cost can be measured on one chip at shard
        # size C — an UPPER bound on the per-shard composite cost, since
        # real shards are C/N rows (benchmarks/run_configs.py config6).
        return HaloView(m=m, index=index)

    def from_rank(src_offset: int, x):
        # receive each array from rank (r + src_offset) mod n
        perm = [(int((i + src_offset) % n), i) for i in range(n)]
        return jax.lax.ppermute(x, axis, perm)

    blocks = [(m.tab, m.keys, m.count, index.dense, index.desc)]
    for off in (1, n - 1):  # next, prev (same device twice when n == 2)
        blocks.append(tuple(from_rank(off, x) for x in blocks[0]))

    # composite dense directory: per column, pick the owning block and
    # offset its slot pointer into the concatenated row space. The grid is
    # the 2-D (_NROW2 + 1, 8) form (vm.SearchIndex.dense); every 8-cell
    # row lies in a single gx column-of-columns (G is 8-divisible), so
    # ownership selects whole rows: row j covers cells [8j-8, 8j), i.e.
    # gx = (j - 1) // (G / 8) (rows 0 and _NROW2 are all-empty padding
    # in every block, so their owner pick is immaterial).
    rows_per_gx = _G // 8          # 8-cell dense rows per gx column
    row_gx = (jnp.arange(vm._NROW2 + 1, dtype=jnp.int32) - 1) // rows_per_gx
    owner_rel = (row_gx % n - r) % n
    dense_cat = jnp.full((vm._NROW2 + 1, 8), _PTR_EMPTY, jnp.int32)
    for b, (_, _, _, dense_b, _) in enumerate(blocks):
        sel = (owner_rel == (0, 1, n - 1)[b])[:, None]
        shifted = jnp.where(dense_b == _PTR_EMPTY, _PTR_EMPTY,
                            dense_b + np.int32(b) * S)
        dense_cat = jnp.where(sel, shifted, dense_cat)

    tab_cat = jnp.concatenate([b[0] for b in blocks])
    keys_cat = jnp.concatenate([b[1] for b in blocks])
    count_cat = jnp.concatenate([b[2] for b in blocks])
    desc_cat = jnp.concatenate([b[4] for b in blocks])
    view_m = VoxelMap(tab=tab_cat, keys=keys_cat, count=count_cat,
                      origin=m.origin, kdim=m.kdim)

    # candidate rows of the composite: a plain padded slice of the
    # concatenated table (r5: no 3x-wide triple-row build anymore)
    RW = index.rows.shape[1]
    view_idx = SearchIndex(
        dense=dense_cat,
        desc=desc_cat,
        rows=vm._search_rows(tab_cat, RW),
    )
    return HaloView(m=view_m, index=view_idx)


def make_spatial_step(cfg, mesh, axis: str = "sp"):
    """(state_shards, scan) -> (state_shards, diag): one odometry scan with
    the keyframe map column-sharded over `axis`.

    state_shards: OdometryState pytree with a leading (N,) shard axis
    (init_spatial_state); scan: one replicated LidarScan. The diagnostics
    are identical on every device (poses psum-synchronized), returned
    unsharded.
    """
    from jax.sharding import PartitionSpec as P

    from lidar_odometry_demo_tpu.pipeline import odometry

    step = odometry.make_process_scan(cfg, spatial_axis=axis)

    def local(state_b, scan):
        state = jax.tree.map(lambda x: x[0], state_b)  # my single shard
        new_state, diag = step(state, scan)
        return jax.tree.map(lambda x: x[None], new_state), diag

    @jax.jit
    def run(state_sh, scan):
        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P()), out_specs=(P(axis), P()),
            # check_vma=False opts out of JAX's static collective
            # correctness checking (the per-shard state pytree mixes
            # device-varying shards with replicated pose scalars the
            # checker cannot type). The psum/ppermute contracts are
            # instead pinned dynamically by the bit-identity tests
            # (tests/test_spatial.py: spatial-vs-single exactness) —
            # re-run those before touching any collective here.
            check_vma=False,
        )
        return f(state_sh, scan)

    return run


def make_spatial_sequence_runner(cfg, mesh, axis: str = "sp"):
    """lax.scan over a stacked (S, ...) scan sequence of the spatial step."""
    from jax.sharding import PartitionSpec as P

    from lidar_odometry_demo_tpu.pipeline import odometry

    step = odometry.make_process_scan(cfg, spatial_axis=axis)

    def local(state_b, scans):
        state = jax.tree.map(lambda x: x[0], state_b)

        def body(s, scan):
            return step(s, scan)

        final, diags = jax.lax.scan(body, state, scans)
        return jax.tree.map(lambda x: x[None], final), diags

    @jax.jit
    def run(state_sh, scans):
        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P()), out_specs=(P(axis), P()),
            # check_vma=False opts out of JAX's static collective
            # correctness checking (the per-shard state pytree mixes
            # device-varying shards with replicated pose scalars the
            # checker cannot type). The psum/ppermute contracts are
            # instead pinned dynamically by the bit-identity tests
            # (tests/test_spatial.py: spatial-vs-single exactness) —
            # re-run those before touching any collective here.
            check_vma=False,
        )
        return f(state_sh, scans)

    return run


def make_batched_spatial_sequence_runner(cfg, mesh, dp_axis: str = "dp",
                                         sp_axis: str = "sp"):
    """The full production mesh shape: independent sequences across
    `dp_axis`, each sequence's keyframe map column-sharded across
    `sp_axis` with per-scan halo exchange.

    state: pytree with leading (DP, SP, ...) axes
    (init_batched_spatial_state); scans: (S, DP, ...) — one stacked scan
    sequence per dp lane, replicated over sp. Returns per-lane final
    states and (S, DP, ...) diagnostics.
    """
    from jax.sharding import PartitionSpec as P

    from lidar_odometry_demo_tpu.pipeline import odometry

    step = odometry.make_process_scan(cfg, spatial_axis=sp_axis)

    def local(state_b, scans_b):
        state = jax.tree.map(lambda x: x[0, 0], state_b)   # my (lane, shard)
        scans = jax.tree.map(lambda x: x[:, 0], scans_b)   # my lane's scans
        final, diags = jax.lax.scan(step, state, scans)
        return (
            jax.tree.map(lambda x: x[None, None], final),
            jax.tree.map(lambda x: x[:, None], diags),
        )

    @jax.jit
    def run(state_sh, scans_sh):
        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(dp_axis, sp_axis), P(None, dp_axis)),
            out_specs=(P(dp_axis, sp_axis), P(None, dp_axis)),
            # check_vma=False opts out of JAX's static collective
            # correctness checking (the per-shard state pytree mixes
            # device-varying shards with replicated pose scalars the
            # checker cannot type). The psum/ppermute contracts are
            # instead pinned dynamically by the bit-identity tests
            # (tests/test_spatial.py: spatial-vs-single exactness) —
            # re-run those before touching any collective here.
            check_vma=False,
        )
        return f(state_sh, scans_sh)

    return run


def init_batched_spatial_state(cfg, dp: int, sp: int):
    """(DP, SP, ...) stacked states: dp independent sequences, each map in
    sp column shards of capacity map_capacity // sp."""
    one = init_spatial_state(cfg, sp)  # (SP, ...)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (dp, *x.shape)).copy(), one
    )


def init_spatial_state(cfg, n_shards: int):
    """Stacked per-shard odometry states: each device's keyframe shard has
    capacity map_capacity // n_shards (leading axis = shard)."""
    from lidar_odometry_demo_tpu.pipeline import odometry

    shard_cap = cfg.map_capacity // n_shards
    # 16-divisible shard capacity: composite desc rows concatenate
    # slot-aligned only when every block holds a whole number of packed
    # 16-slot rows (vm.SearchIndex.desc)
    assert shard_cap % 16 == 0, (
        f"map_capacity // n_shards = {shard_cap} must be 16-divisible")
    one = odometry.OdometryState(
        keyframe=vm.map_init(shard_cap, cfg.keyframe_max_points_cnt),
        current=se3.Pose.identity(),
        previous=se3.Pose.identity(),
    )
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_shards, *x.shape)).copy(), one
    )
