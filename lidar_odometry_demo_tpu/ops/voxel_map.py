"""Sorted-key voxel map: the TPU-native replacement for the reference's
hash-voxel grid.

The reference's `VoxelGrid` (src/voxel_grid.h:17-257) is a robin_map from
int64 voxel indices to capped point lists, serving triple duty as
downsampler, keyframe map, and NN-search index. Pointer-chasing hash tables
don't map to TPUs; this module re-designs the structure as fixed-capacity
sorted arrays:

- voxel coords quantized by truncation toward zero — reproducing the
  reference's `(int64)(x / voxel_size)` quirk where the 8 voxels around the
  origin merge (voxel_grid.h:68-75),
- coords packed into a single int32 key (11/11/9 bits for x/y/z) relative
  to a rebasable integer origin; the radius-evicted map (80 m) always fits,
- the table is kept sorted by key: lookup is a vectorized binary search
  (O(log C) gathers), insertion is scatter + one XLA sort, eviction is a
  mask + re-sort. Sorting beats hashing on TPU: no collisions, no probing,
  deterministic first-come-kept semantics via stable sort.

Per-voxel semantics match the reference: capacity-capped point lists that
keep the first `max_points` arrivals and drop overflow (voxel_grid.h:77-93),
the first stored point acting as the eviction anchor (voxel_with_planes.h:32),
and 27-neighborhood brute-force nearest-point search under a distance gate
returning the stored normal as the matching plane (voxel_grid.h:164-204).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_odometry_demo_tpu.ops.cloud import PointsWithNormals

# int32 key packing: x:[20..30] (11 bits), y:[9..19] (11 bits), z:[0..8] (9 bits).
# 31 bits total keeps every key non-negative int32 — int32 is deliberate: on
# the current TPU runtime, programs touching uint32 arrays with the top bit
# set (e.g. a 0xFFFFFFFF empty marker) flip the device into a ~100x slower
# gather mode for the rest of the process (see scripts/degrade_*.py for the
# bisection evidence); int32 keys with a 0x7FFFFFFF empty marker avoid it.
# Coordinate window around the rebasable origin: x/y +-1024 voxels,
# z +-256 voxels (at the 0.1 m update grid that is +-102 m / +-25.6 m —
# ample for an 80 m range gate and VLP16's +-15 deg vertical fan).
_XB, _YB, _ZB = 11, 11, 9
_XOFF, _YOFF, _ZOFF = 1 << (_XB - 1), 1 << (_YB - 1), 1 << (_ZB - 1)
# np.int32, NOT jnp.int32: module-level jnp device constants captured by
# closure fault the TPU runtime into a ~100x degraded mode
# (scripts/degrade_const.py); NumPy scalars become inlined XLA literals.
EMPTY_KEY = np.int32(0x7FFFFFFF)


class VoxelMap(NamedTuple):
    """Fixed-capacity voxel table: sorted key index over fixed physical rows.

    The logical index is sorted by packed key and permuted on every insert;
    the point payload (pts / nrm) lives in immutable PHYSICAL rows addressed
    through the row pointer, so the per-scan table sort never touches the
    2x(K,3) payload (~480 B/voxel). The index itself is packed into ONE
    (C, 8)-int32 `meta` array — key, count, physical row, bitcast anchor —
    because gathers on this TPU are row-COUNT bound (~160M rows/s whatever
    the row width; scripts/micro_batched.py): permuting one 8-lane array
    costs the same as permuting a single (C,) column, 4x less than
    permuting the four columns separately.

    meta: (C, 8) int32, rows sorted by meta[:, 0] (EMPTY_KEY-padded):
      [:, 0] packed voxel key, ascending
      [:, 1] points stored in the voxel
      [:, 2] physical row holding the voxel's points
      [:, 3:6] first stored point, float32 bitcast (eviction anchor +
               sparse export, reference voxel_with_planes.h:32-35)
      [:, 6:8] padding (sublane alignment)
    Physical order (never permuted):
      occ:  (C,)      bool physical row in use
      pts:  (C, K, 3) float32 stored points (world frame)
      nrm:  (C, K, 3) float32 stored unit normals
    origin: (3,)      int32 integer-index origin the keys are relative to
    """

    meta: jax.Array
    occ: jax.Array
    pts: jax.Array
    nrm: jax.Array
    origin: jax.Array

    @property
    def keys(self) -> jax.Array:
        return self.meta[..., 0]

    @property
    def count(self) -> jax.Array:
        return self.meta[..., 1]

    @property
    def row(self) -> jax.Array:
        return self.meta[..., 2]

    @property
    def anchor(self) -> jax.Array:
        return jax.lax.bitcast_convert_type(self.meta[..., 3:6], jnp.float32)

    @property
    def capacity(self) -> int:
        return self.meta.shape[-2]

    @property
    def max_points(self) -> int:
        return self.pts.shape[-2]


def _pack_meta(keys: jax.Array, count: jax.Array, row: jax.Array,
               anchor: jax.Array) -> jax.Array:
    """Assemble the (C, 8) meta rows from the narrow working columns."""
    c = keys.shape[0]
    pad = jnp.zeros((c, 2), jnp.int32)
    return jnp.concatenate(
        [
            keys[:, None], count[:, None], row[:, None],
            jax.lax.bitcast_convert_type(anchor, jnp.int32),
            pad,
        ],
        axis=1,
    )


class Correspondence(NamedTuple):
    """Match of a query point against the map (voxel_grid.h:40-46)."""

    source_local: jax.Array  # (Q, 3) query point in its local frame
    plane_origin: jax.Array  # (Q, 3) matched stored point
    plane_normal: jax.Array  # (Q, 3) matched stored normal
    valid: jax.Array         # (Q,)


def voxel_indices(xyz: jax.Array, voxel_size: float) -> jax.Array:
    """Integer voxel index by truncation toward zero (voxel_grid.h:68-75)."""
    return jnp.trunc(xyz / voxel_size).astype(jnp.int32)


def pack_keys(idx: jax.Array, origin: jax.Array, valid: jax.Array,
              map_window: bool = False) -> jax.Array:
    """Pack relative integer indices into sortable int32 keys.

    Out-of-range indices (beyond the 11/11/9-bit window around origin) and
    invalid entries map to EMPTY_KEY, which sorts after every valid key.

    map_window=True additionally restricts the key domain to exactly what
    the column directory can see (see build_search_index): z to the
    +-_DIR_ZHALF window and x/y to the +-_GHALF column window. Used for
    every KEYFRAME table insert so the table never holds a key the
    directory misses — this is what makes the index-accelerated insert in
    _insert_impl safe (a directory miss is then always a true miss; an
    out-of-window point can never alias an in-table key and insert a
    duplicate). At the 0.2 m keyframe voxel the windows are +-25.6 m
    vertical (beyond VLP16 reach: +-15 deg at 80 m = +-20.7 m) and
    +-102.4 m horizontal (beyond the 80 m radius eviction + rebase).
    Scan-local downsample grids keep the full 11/11/9-bit range (needed
    at 0.1 m).
    """
    rel = idx - origin
    rx = rel[..., 0] + _XOFF
    ry = rel[..., 1] + _YOFF
    rz = rel[..., 2] + _ZOFF
    in_range = (
        (rx >= 0) & (rx < (1 << _XB) - 1)
        & (ry >= 0) & (ry < (1 << _YB) - 1)
        & (rz >= 0) & (rz < (1 << _ZB) - 1)
    )
    if map_window:
        in_range = (
            in_range
            & (rz >= _DIR_ZLO) & (rz < _DIR_ZLO + 2 * _DIR_ZHALF)
            & (rx >= _XOFF - _GHALF) & (rx < _XOFF + _GHALF)
            & (ry >= _YOFF - _GHALF) & (ry < _YOFF + _GHALF)
        )
    key = (rx << (_YB + _ZB)) | (ry << _ZB) | rz
    return jnp.where(valid & in_range, key, EMPTY_KEY)


def _shift_key(delta: jax.Array) -> jax.Array:
    """Key-space shift corresponding to an origin move by integer `delta`.

    Subtracting this constant from every valid key re-bases the whole table
    without re-sorting (a uniform shift preserves lexicographic order as
    long as coordinates stay in range, which radius eviction guarantees).
    """
    return (delta[0] << (_YB + _ZB)) + (delta[1] << _ZB) + delta[2]


def map_init(capacity: int, max_points: int) -> VoxelMap:
    meta = jnp.zeros((capacity, 8), jnp.int32).at[:, 0].set(EMPTY_KEY)
    return VoxelMap(
        meta=meta,
        occ=jnp.zeros((capacity,), bool),
        pts=jnp.zeros((capacity, max_points, 3), jnp.float32),
        nrm=jnp.zeros((capacity, max_points, 3), jnp.float32),
        origin=jnp.zeros((3,), jnp.int32),
    )


def map_size(m: VoxelMap) -> jax.Array:
    """Number of occupied voxels (reference voxel_grid.h:248-251)."""
    return jnp.sum((m.keys != EMPTY_KEY).astype(jnp.int32))


# ---------------------------------------------------------------------------
# grouping helpers over key-sorted arrays
# ---------------------------------------------------------------------------

def _group_structure(sorted_keys: jax.Array):
    """For a sorted key array return (leader, rank, start_pos).

    leader: True at the first element of each equal-key run (EMPTY excluded)
    rank:   position within the run
    start:  index of the run's leader, per element
    """
    n = sorted_keys.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    valid = sorted_keys != EMPTY_KEY
    prev = jnp.concatenate([jnp.array([EMPTY_KEY], sorted_keys.dtype), sorted_keys[:-1]])
    leader = valid & (sorted_keys != prev)
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(leader, pos, -1))
    rank = pos - start
    return leader, rank, start


# ---------------------------------------------------------------------------
# downsampling grid (reference: VoxelGrid(voxel, 1) used as a filter,
# lidar_odometry.cpp:37-47)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("voxel_size", "budget"))
def downsample(pts: PointsWithNormals, voxel_size: float, budget: int) -> PointsWithNormals:
    """1-point-per-voxel downsampling keeping the first point per voxel in
    input order (reference addCloud with max_points=1, voxel_grid.h:77-93),
    compacted to a fixed `budget`.

    Scan-local: uses a zero origin; inputs must be within the key window
    (true after the 80 m range gate).
    """
    n = pts.capacity
    take = min(budget, n)
    pad = budget - take
    zero_origin = jnp.zeros((3,), jnp.int32)
    keys = pack_keys(voxel_indices(pts.xyz, voxel_size), zero_origin, pts.valid)
    order = jnp.argsort(keys, stable=True)  # ties keep input order
    sorted_keys = keys[order]
    leader, _, _ = _group_structure(sorted_keys)
    # compact leaders to the front (stable: stays in key order)
    comp = jnp.argsort(~leader, stable=True)[:take]
    src = order[comp]
    ok = leader[comp] & (jnp.arange(take) < jnp.sum(leader.astype(jnp.int32)))
    out = PointsWithNormals(
        xyz=jnp.where(ok[:, None], pts.xyz[src], 0.0),
        normal=jnp.where(ok[:, None], pts.normal[src], 0.0),
        valid=ok,
    )
    if pad:
        out = PointsWithNormals(
            xyz=jnp.concatenate([out.xyz, jnp.zeros((pad, 3), out.xyz.dtype)]),
            normal=jnp.concatenate([out.normal, jnp.zeros((pad, 3), out.normal.dtype)]),
            valid=jnp.concatenate([out.valid, jnp.zeros((pad,), bool)]),
        )
    return out


# ---------------------------------------------------------------------------
# keyframe map insert (reference addCloud, voxel_grid.h:77-93)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("voxel_size",))
def map_insert(m: VoxelMap, new: PointsWithNormals, *, voxel_size: float) -> VoxelMap:
    """Insert points (world frame) with first-come-kept capping semantics.

    New points join existing voxels only while `count < max_points`
    (drop overflow, voxel_grid.h:88-91); new voxels are appended into free
    slots and the table re-sorted. Deterministic: incoming points are
    processed in input order within each voxel (stable sort), voxels in key
    order.
    """
    return _insert_impl(m, new, m.keys, m.count, m.origin, voxel_size)


def _directory_lookup(
    m: VoxelMap, index: SearchIndex, sxyz: jax.Array, valid_e: jax.Array,
    voxel_size: float,
):
    """(pos, found) of each point's voxel in the sorted table via the column
    directory — replaces jnp.searchsorted, whose XLA lowering (a 17-round
    elementwise-gather while loop) costs ~10 ms/scan on this TPU where the
    directory row-gather + popcount rank-select costs ~0.3 ms.

    Coordinates are taken relative to m.origin (the directory's frame); the
    caller may store keys relative to a different (rebased) origin — a
    uniform key shift preserves sorted order, so positions agree.
    """
    C = m.capacity
    idx = voxel_indices(sxyz, voxel_size) - m.origin
    gx = idx[..., 0] + _GHALF
    gy = idx[..., 1] + _GHALF
    z = idx[..., 2] + _DIR_ZHALF
    in_win = (
        valid_e & (gx >= 0) & (gx < _G) & (gy >= 0) & (gy < _G)
        & (z >= 0) & (z < 2 * _DIR_ZHALF)
    )
    cell = jnp.where(in_win, gx * _G + gy, _G * _G)
    start = index.dense[cell]                # (N,) leader slot or EMPTY
    got = start != _PTR_EMPTY
    start_c = jnp.where(got, start, 0)
    zmask = index.desc[start_c]              # (N, ZWORDS)
    zmask = jnp.where(got[..., None], zmask, 0)
    zc = jnp.clip(z, 0, 2 * _DIR_ZHALF - 1)
    pos = start_c + _popcount_below(zmask, zc)
    found = in_win & got & _zbit(zmask, zc)
    pos = jnp.where(found, jnp.minimum(pos, C - 1), C - 1)
    return pos, found


def _insert_impl(
    m: VoxelMap,
    new: PointsWithNormals,
    keys1: jax.Array,
    count1: jax.Array,
    new_origin: jax.Array,
    voxel_size: float,
    index: SearchIndex | None = None,
) -> VoxelMap:
    """Shared insert body: add `new` against the (possibly tombstoned)
    logical index (keys1, count1), writing payloads into physical rows and
    re-sorting only the small key-order arrays.

    Tombstones (key present, count 0 after eviction) are re-populated in
    place — their physical row is reused and their anchor reset to the
    first incoming point, matching the reference's erase-then-reinsert
    (voxel_grid.h:236-246 + 77-93). Unreused tombstones are dropped at the
    end and their physical rows freed.
    """
    C, K = m.capacity, m.max_points
    keys = pack_keys(voxel_indices(new.xyz, voxel_size), new_origin, new.valid,
                     map_window=True)

    order = jnp.argsort(keys, stable=True)
    skeys = keys[order]
    sxyz = new.xyz[order]
    snrm = new.normal[order]
    leader, rank, start = _group_structure(skeys)
    valid_e = skeys != EMPTY_KEY

    # lookup each (distinct) key in the existing table. With a prebuilt
    # directory (same map, origin m.origin) the lookup is one small row
    # gather + popcounts; the searchsorted fallback covers standalone use.
    if index is not None:
        pos_c, found = _directory_lookup(m, index, sxyz, valid_e, voxel_size)
        found = found & (keys1[pos_c] == skeys)  # belt & braces (cheap)
    else:
        pos = jnp.searchsorted(keys1, skeys).astype(jnp.int32)
        pos_c = jnp.minimum(pos, C - 1)
        found = valid_e & (keys1[pos_c] == skeys)

    # fresh key-slot assignment for missing groups
    n_used = jnp.sum((keys1 != EMPTY_KEY).astype(jnp.int32))
    missing_leader = leader & ~found
    fresh_idx = jnp.cumsum(missing_leader.astype(jnp.int32)) - 1
    fresh_slot = n_used + fresh_idx  # only meaningful at missing leaders

    # fresh PHYSICAL rows for missing groups: compact the free rows to the
    # front (stable bool argsort: free rows in ascending physical order —
    # deterministic)
    free_rows = jnp.argsort(m.occ, stable=True).astype(jnp.int32)
    fresh_phys = free_rows[jnp.minimum(fresh_idx, C - 1)]

    # per-element key slot, physical row & base write index, broadcast
    # from the group leader
    slot = jnp.where(found, pos_c, fresh_slot)[start]
    phys = jnp.where(found, m.row[pos_c], fresh_phys)[start]
    base = jnp.where(found, count1[pos_c], 0)[start]
    write_idx = base + rank

    keep = valid_e & (write_idx < K) & (slot < C) & (slot >= 0)
    phys_w = jnp.where(keep, phys, C)  # out-of-range -> dropped
    widx_w = jnp.where(keep, write_idx, 0)
    pts2 = m.pts.at[phys_w, widx_w].set(sxyz, mode="drop")
    nrm2 = m.nrm.at[phys_w, widx_w].set(snrm, mode="drop")

    # counts: one scatter per leader with the clamped new count.
    # Group end = next key-change position (including the change into the
    # EMPTY-padded tail, which is not a leader but is a boundary).
    n = len(keep)
    prev_key = jnp.concatenate([jnp.array([EMPTY_KEY], skeys.dtype), skeys[:-1]])
    boundary = jnp.concatenate([jnp.array([True]), (skeys != prev_key)[1:]])
    nxt = jax.lax.associative_scan(
        jnp.minimum,
        jnp.where(boundary, jnp.arange(n, dtype=jnp.int32), n),
        reverse=True,
    )
    # nxt[i] = nearest boundary at-or-after i; strict next boundary for a
    # leader at p is nxt[p+1] (or N at the end)
    nxt_strict = jnp.concatenate([nxt[1:], jnp.array([n], jnp.int32)])
    group_size = jnp.where(leader, nxt_strict - jnp.arange(n, dtype=jnp.int32), 0)
    new_count = jnp.minimum(K, base + group_size)
    slot_ok = leader & (slot < C) & (slot >= 0)
    cnt_slot = jnp.where(slot_ok, slot, C)
    count2 = count1.at[cnt_slot].set(jnp.where(leader, new_count, 0), mode="drop")

    # register fresh keys + their physical rows; set anchors wherever a
    # voxel receives its FIRST point (fresh voxel or reused tombstone)
    key_slot = jnp.where(missing_leader & (slot < C), slot, C)
    keys2 = keys1.at[key_slot].set(skeys, mode="drop")
    row2 = m.row.at[key_slot].set(phys, mode="drop")
    anchor_slot = jnp.where(slot_ok & (base == 0), slot, C)
    anchor2 = m.anchor.at[anchor_slot].set(sxyz, mode="drop")
    occ2 = m.occ.at[jnp.where(missing_leader & (slot < C), phys, C)].set(
        True, mode="drop"
    )

    # drop unreused tombstones (count still 0) and free their rows
    tomb = (keys2 != EMPTY_KEY) & (count2 == 0)
    keys2 = jnp.where(tomb, EMPTY_KEY, keys2)
    occ2 = occ2.at[jnp.where(tomb, row2, C)].set(False, mode="drop")

    # re-sort the logical index by key: ONE packed-row permute
    meta2 = _pack_meta(keys2, count2, row2, anchor2)
    perm = jnp.argsort(keys2)
    return VoxelMap(
        meta=meta2[perm],
        occ=occ2,
        pts=pts2,
        nrm=nrm2,
        origin=new_origin,
    )


# ---------------------------------------------------------------------------
# radius eviction + origin rebase (reference radiusCleanup, voxel_grid.h:236-246)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("radius", "voxel_size"))
def radius_cleanup(m: VoxelMap, center: jax.Array, *, radius: float, voxel_size: float) -> VoxelMap:
    """Erase voxels whose *first stored point* is farther than `radius` from
    `center` (the reference anchors eviction on VoxelWithPlanes::getOrigin,
    voxel_with_planes.h:32-35), then re-base the key origin to the current
    center so the coordinate window tracks the sensor.
    """
    d2 = jnp.sum((m.anchor - center) ** 2, axis=-1)
    occupied = m.keys != EMPTY_KEY

    # rebase: shift all valid keys by the origin delta (order-preserving)
    new_origin = voxel_indices(center, voxel_size)
    shift = _shift_key(new_origin - m.origin)
    shifted = m.keys - shift
    # evict beyond the radius, and the (VLP16-unreachable) voxels whose
    # rebased z leaves the directory window — keeps the directory covering
    # the whole table (see pack_keys map_window)
    rz = shifted & ((1 << _ZB) - 1)
    in_zwin = (rz >= _DIR_ZLO) & (rz < _DIR_ZLO + 2 * _DIR_ZHALF)
    keep = occupied & (d2 <= radius * radius) & in_zwin
    keys = jnp.where(keep, shifted, EMPTY_KEY)
    count = jnp.where(keep, m.count, 0)
    occ = m.occ.at[jnp.where(occupied & ~keep, m.row, m.capacity)].set(
        False, mode="drop"
    )

    meta = _pack_meta(keys, count, m.row, m.anchor)
    perm = jnp.argsort(keys)
    return VoxelMap(
        meta=meta[perm],
        occ=occ,
        pts=m.pts,
        nrm=m.nrm,
        origin=new_origin,
    )


# ---------------------------------------------------------------------------
# fused per-scan maintenance: evict + rebase + insert with ONE table sort
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("voxel_size", "radius", "origin_quantum"))
def map_update(
    m: VoxelMap, new: PointsWithNormals, center: jax.Array,
    *, voxel_size: float, radius: float, index: SearchIndex | None = None,
    origin_quantum: int = 1,
) -> VoxelMap:
    """radius_cleanup followed by map_insert, fused to a single sort pass.

    Semantically identical to the reference's per-scan sequence
    (lidar_odometry.cpp:67-70: radiusCleanup then addCloud) but instead of
    two sort+permute passes over the table it tombstones evicted voxels
    (key kept, count zeroed — a uniform key shift preserves sortedness, so
    lookups during insertion still work), inserts, then drops unreused
    tombstones and sorts once.

    origin_quantum > 1 snaps the rebased origin's x/y down to a multiple of
    the quantum (floor division — deterministic). Used by the spatially
    sharded map (parallel/spatial.py): column ownership `gx mod N` is
    invariant under origin shifts that are multiples of N, so shard
    ownership never changes across rebases and voxels never migrate
    between devices. The origin is then at most quantum-1 voxels from the
    sensor — negligible against the +-512-voxel key window.
    """
    # rebase + tombstone eviction (keys stay sorted: uniform shift). The
    # tombstoned voxel keeps its key and physical row so a same-scan
    # re-insert can reuse both; _insert_impl drops unreused tombstones and
    # frees their rows at the end.
    new_origin = voxel_indices(center, voxel_size)
    if origin_quantum > 1:
        q = np.int32(origin_quantum)
        new_origin = new_origin.at[:2].set((new_origin[:2] // q) * q)
    shift = _shift_key(new_origin - m.origin)
    occupied = m.keys != EMPTY_KEY
    keys1 = jnp.where(occupied, m.keys - shift, EMPTY_KEY)
    d2 = jnp.sum((m.anchor - center) ** 2, axis=-1)
    rz1 = keys1 & ((1 << _ZB) - 1)
    out_zwin = (rz1 < _DIR_ZLO) | (rz1 >= _DIR_ZLO + 2 * _DIR_ZHALF)
    evict = occupied & ((d2 > radius * radius) | out_zwin)
    count1 = jnp.where(evict, 0, m.count)

    return _insert_impl(m, new, keys1, count1, new_origin, voxel_size, index)


# ---------------------------------------------------------------------------
# 27-neighborhood correspondence search (reference getCorrespondence /
# findMatchingPairs, voxel_grid.h:164-234)
# ---------------------------------------------------------------------------

# np.array (inlined literal), not jnp — see EMPTY_KEY note. Column scan
# order (dx, dy ascending) x (z-1, z, z+1) reproduces the reference's
# ix/iy/iz neighbor order (voxel_grid.h:175-177) for tie-breaking.
_COLUMN_OFFSETS = np.array(
    [[ix, iy, 0] for ix in (-1, 0, 1) for iy in (-1, 0, 1)], np.int32
)  # (9, 3)

# Column-directory geometry. The directory is a dense (2^GB, 2^GB) grid over
# the (x, y) column space centered on the key window's midpoint: gx = rx -
# (XOFF - GHALF). Every voxel the radius-evicted map can hold (<= ~405 voxels
# from origin at 0.2 m / 80 m) and every gated query (<= ~406) falls inside
# GHALF = 512, so directory misses are exactly the true misses.
_GB = 10
_G = 1 << _GB            # 1024 columns per axis
_GHALF = _G // 2
# Directory z window: 256 bits (+-128 voxels) centered on the key window's
# z midpoint — +-25.6 m at the 0.2 m keyframe voxel, beyond VLP16 reach.
# Keyframe inserts use pack_keys(map_window=True) so the table never holds
# a voxel the directory cannot see.
_DIR_ZHALF = 128
_DIR_ZLO = _ZOFF - _DIR_ZHALF       # z-field value of directory bit 0
_ZWORDS = (2 * _DIR_ZHALF) // 32    # 8 int32 words
_DIR_W = 1 + _ZWORDS                # [column start slot, z-occupancy x8]


_PTR_EMPTY = np.int32(0x7FFFFFFF)


class SearchIndex(NamedTuple):
    """Per-scan acceleration structure for the 27-neighborhood search.

    The voxel table is frozen for the whole ICP loop, so we precompute once:

    dense: (G*G + 1,) int32 — per (x, y) column, the sorted-table slot of
        the column's FIRST voxel (columns are consecutive runs in the
        key-sorted table), or _PTR_EMPTY. Pointer-only on purpose: a dense
        1M-row directory holding the z-masks inline costs ~10 ms/lane-scan
        in buffer init/rewrite at batch 8 (xplane trace); a 4 MB pointer
        grid + the compact `desc` below costs ~1 ms. Row G*G is the
        always-empty overflow cell.
    desc: (C, ZWORDS) int32 — at each column-leader slot, the column's
        256-bit z-occupancy bitmask (garbage elsewhere; only leader slots
        are ever dereferenced). A query resolves voxel (x, y, z) to its
        exact table slot as `ptr + popcount(bits below z)` — one element
        gather + one 8-wide row gather + VPU popcounts, instead of a
        17-step binary search per column (searchsorted measured ~4x slower
        on TPU; scripts/micro_corr.py, and its XLA lowering costs ~10 ms
        per scan in map_update; scripts/profile_map_update.py).
    rows64: (C, 64) float32 — the stored points in KEY order (gathered once
        per scan through m.row), flattened to K*3 = 60 lanes with the
        voxel's point count fused in lane 60. Candidate gathers index this
        by sorted-table slot directly and bring their own occupancy —
        gathers are row-COUNT bound on this TPU (~160M rows/s regardless
        of row bytes; scripts/micro_batched.py), so folding the per-query
        row+count lookups into one per-scan C-row gather is a large win.
    """

    dense: jax.Array
    desc: jax.Array
    rows64: jax.Array


def build_search_index(m: VoxelMap) -> SearchIndex:
    """Build the per-scan column directory + key-ordered candidate rows."""
    C, K = m.capacity, m.max_points
    keys = m.keys
    occ = keys != EMPTY_KEY
    rx = jax.lax.shift_right_logical(keys, _YB + _ZB)          # 11-bit x field
    ry = jax.lax.shift_right_logical(keys, _ZB) & ((1 << _YB) - 1)
    rz = keys & ((1 << _ZB) - 1)
    gx = rx - (_XOFF - _GHALF)
    gy = ry - (_YOFF - _GHALF)
    zd = rz - _DIR_ZLO
    in_win = (
        occ & (gx >= 0) & (gx < _G) & (gy >= 0) & (gy < _G)
        & (zd >= 0) & (zd < 2 * _DIR_ZHALF)
    )
    cell = jnp.where(in_win, gx * _G + gy, _G * _G)

    # column leaders + per-element leader slot (columns are consecutive
    # runs of the sorted keys)
    colkey = jax.lax.shift_right_logical(keys, _ZB)
    prev = jnp.concatenate([jnp.array([-1], jnp.int32), colkey[:-1]])
    leader = in_win & ((colkey != prev)
                       | ~jnp.concatenate([jnp.array([False]), in_win[:-1]]))
    iota = jnp.arange(C, dtype=jnp.int32)
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(leader, iota, -1))

    # dense pointer grid: one scalar scatter (leaders only; one per column)
    dense = jnp.full((_G * _G + 1,), _PTR_EMPTY, jnp.int32)
    dense = dense.at[jnp.where(leader, cell, _G * _G)].set(
        jnp.where(leader, iota, _PTR_EMPTY), mode="drop"
    )
    # the overflow cell must stay empty (invalid queries point there)
    dense = dense.at[_G * _G].set(_PTR_EMPTY)

    # compact z-occupancy at leader slots: one flat scalar scatter-add
    # (z unique per voxel within a column, so add == or; bit 31 wraps to
    # int32 min — the right bit pattern; int32 throughout, see EMPTY_KEY)
    word = jnp.where(in_win, jax.lax.shift_right_logical(zd, 5), 0)
    bit = jax.lax.shift_left(jnp.int32(1), zd & 31)
    desc_flat = jnp.zeros((C * _ZWORDS,), jnp.int32)
    desc_flat = desc_flat.at[
        jnp.where(in_win, start * _ZWORDS + word, C * _ZWORDS)
    ].add(jnp.where(in_win, bit, 0), mode="drop")
    desc = desc_flat.reshape(C, _ZWORDS)

    # key-ordered candidate rows: ONE C-row gather through the physical
    # indirection per scan, padded to a sublane multiple
    width = -(-(K * 3 + 1) // 8) * 8
    rows64 = jnp.concatenate(
        [
            m.pts.reshape(C, K * 3)[m.row],
            m.count.astype(jnp.float32)[:, None],
            jnp.zeros((C, width - K * 3 - 1), jnp.float32),
        ],
        axis=1,
    )
    return SearchIndex(dense=dense, desc=desc, rows64=rows64)


def _popcount_below(zmask: jax.Array, z: jax.Array) -> jax.Array:
    """Number of set bits strictly below bit index z (vectorized rank).

    zmask: (..., ZWORDS) int32; z: (...) int32 in [0, 2*_DIR_ZHALF).
    """
    word = jax.lax.shift_right_logical(z, 5)
    bit = z & 31
    # mask of bits below `bit` within z's word
    low = jax.lax.shift_left(jnp.int32(1), bit) - 1  # bit==31 wraps to -1+.. ok:
    # shift_left(1, 31) = int32 min; min - 1 = 0x7FFFFFFF = bits 0..30 ✓
    total = jnp.zeros(z.shape, jnp.int32)
    for w in range(_ZWORDS):
        mw = zmask[..., w]
        sel_full = w < word
        sel_part = w == word
        masked = jnp.where(sel_part, mw & low, jnp.where(sel_full, mw, 0))
        total = total + jax.lax.population_count(masked)
    return total


def _zbit(zmask: jax.Array, z: jax.Array) -> jax.Array:
    """Whether bit z is set; z outside the directory window -> False."""
    ok = (z >= 0) & (z < 2 * _DIR_ZHALF)
    zc = jnp.clip(z, 0, 2 * _DIR_ZHALF - 1)
    word = jax.lax.shift_right_logical(zc, 5)
    bit = zc & 31
    w = jnp.zeros(z.shape, jnp.int32)
    for wi in range(_ZWORDS):  # unrolled select — no gather
        w = jnp.where(word == wi, zmask[..., wi], w)
    return ok & (jax.lax.shift_right_logical(w, bit) & 1).astype(bool)


def _neighborhood_slots(
    m: VoxelMap,
    index: SearchIndex,
    q_world: jax.Array,
    query_valid: jax.Array,
    *,
    voxel_size: float,
):
    """Exact sorted-table slots of the 3x3x3 neighborhood of each query.

    Returns (slots (Q, 9, 3) int32 clamped to [0, C-1], present (Q, 9, 3)
    bool). Shared by the per-iteration search and the per-scan candidate
    gather; the (column, z) order matches the reference's neighbor scan
    order (voxel_grid.h:175-177).
    """
    C = m.capacity
    Q = q_world.shape[0]
    base_idx = voxel_indices(q_world, voxel_size) - m.origin  # relative (Q, 3)
    col_xy = base_idx[:, None, :2] + _COLUMN_OFFSETS[None, :, :2]  # (Q, 9, 2)
    gx = col_xy[..., 0] + _GHALF
    gy = col_xy[..., 1] + _GHALF
    zq = base_idx[:, 2] + _DIR_ZHALF  # (Q,) directory z bit of the query voxel
    col_ok = (
        query_valid[:, None]
        & (gx >= 0) & (gx < _G) & (gy >= 0) & (gy < _G)
    )
    cell = jnp.where(col_ok, gx * _G + gy, _G * _G)  # overflow row: empty

    # two-hop lookup: pointer grid then compact leader descriptors
    start = index.dense[cell.reshape(-1)].reshape(Q, 9)     # (Q, 9) or EMPTY
    got = start != _PTR_EMPTY
    start_c = jnp.where(got, start, 0)
    zmask = index.desc[start_c.reshape(-1)].reshape(Q, 9, _ZWORDS)
    zmask = jnp.where(got[..., None], zmask, 0)
    col_ok = col_ok & got

    # exact slots of (z-1, z, z+1) per column by rank-select
    start = start_c
    zq9 = jnp.broadcast_to(zq[:, None], (Q, 9))
    rank_m1 = _popcount_below(zmask, jnp.clip(zq9 - 1, 0, 2 * _DIR_ZHALF - 1))
    p_m1 = _zbit(zmask, zq9 - 1) & col_ok
    p_0 = _zbit(zmask, zq9) & col_ok
    p_p1 = _zbit(zmask, zq9 + 1) & col_ok
    s_m1 = start + rank_m1
    s_0 = s_m1 + p_m1.astype(jnp.int32)
    s_p1 = s_0 + p_0.astype(jnp.int32)
    slots = jnp.stack([s_m1, s_0, s_p1], axis=-1)    # (Q, 9, 3)
    present = jnp.stack([p_m1, p_0, p_p1], axis=-1)  # (Q, 9, 3)
    slots = jnp.where(present, jnp.minimum(slots, C - 1), C - 1)
    return slots, present


class CandidateSet(NamedTuple):
    """Per-query 27-voxel candidate cache for the ICP loop.

    The map is frozen for the whole ICP solve, and the pose moves by at
    most a few cm between outer iterations, so the 3x3x3 candidate
    neighborhoods barely change. Gathering every candidate row ONCE (at
    the initial-guess pose) and re-evaluating distances against the cached
    points each outer iteration turns the per-iteration random-access
    gather (~40 GB/s effective on this TPU) into a linear stream the VPU
    eats at full bandwidth. The 0.3 m distance gate still applies exactly;
    the only deviation from re-searching each iteration is that a query
    whose pose-updated position crosses a voxel boundary keeps its
    guess-pose neighborhood (bounded by the intra-ICP pose motion, << the
    0.2 m voxel + 0.3 m gate slack — validated against the exact search in
    tests/test_voxel_map.py::test_cached_candidates_match_exact_search and
    trajectory-level vs the oracle in tests/test_oracle_equivalence.py).

    pts:   (Q, 27, K, 3) candidate points, (col, z) in reference scan order
    ok:    (Q, 27, K)    candidate validity (present voxel, k < count)
    slots: (Q, 27)       sorted-table slot per candidate voxel
    """

    pts: jax.Array
    ok: jax.Array
    slots: jax.Array


def gather_candidates(
    m: VoxelMap,
    index: SearchIndex,
    query_local: jax.Array,
    query_valid: jax.Array,
    pose_t: jax.Array,
    pose_R: jax.Array,
    *,
    voxel_size: float,
) -> CandidateSet:
    """Materialize every query's 27-voxel candidates with one gather."""
    C, K = m.capacity, m.max_points
    Q = query_local.shape[0]
    q_world = query_local @ pose_R.T + pose_t
    slots, present = _neighborhood_slots(
        m, index, q_world, query_valid, voxel_size=voxel_size
    )
    slots27 = slots.reshape(Q, 27)
    rows = index.rows64[slots27.reshape(-1)].reshape(Q, 27, -1)  # THE gather
    pts = rows[..., : K * 3].reshape(Q, 27, K, 3)
    cnt = rows[..., K * 3].astype(jnp.int32)
    kidx = np.arange(K, dtype=np.int32)[None, None, :]
    ok = present.reshape(Q, 27)[..., None] & (kidx < cnt[..., None])
    return CandidateSet(pts=pts, ok=ok, slots=slots27)


def match_candidates(
    m: VoxelMap,
    cand: CandidateSet,
    query_local: jax.Array,
    query_valid: jax.Array,
    pose_t: jax.Array,
    pose_R: jax.Array,
    *,
    max_distance: float,
) -> Correspondence:
    """Nearest cached candidate under the distance gate at the CURRENT pose.

    Tie-breaking matches find_correspondences_indexed exactly: first
    minimum in (column scan, z, insertion) order — the cache layout is
    (col, z, k), so one flat argmin reproduces it.
    """
    Q, _, K, _ = cand.pts.shape
    q_world = query_local @ pose_R.T + pose_t
    max_d2 = np.float32(max_distance * max_distance)
    diff = cand.pts - q_world[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)              # (Q, 27, K)
    d2 = jnp.where(cand.ok & (d2 < max_d2), d2, max_d2)
    flat = d2.reshape(Q, 27 * K)
    loc = jnp.argmin(flat, axis=-1)                 # first min in (c,z,k)
    best_d2 = jnp.take_along_axis(flat, loc[:, None], axis=-1)[:, 0]
    c_idx = loc // K
    k_idx = (loc % K).astype(jnp.int32)
    valid = query_valid & (best_d2 < max_d2)
    best_slot = jnp.take_along_axis(cand.slots, c_idx[:, None], axis=-1)[:, 0]
    best_phys = m.row[best_slot]                    # (Q,) winner indirection
    flat_pts = cand.pts.reshape(Q, 27 * K, 3)
    plane_origin = jnp.take_along_axis(flat_pts, loc[:, None, None], axis=1)[:, 0]
    plane_normal = m.nrm[best_phys, k_idx]          # tiny winner gather
    return Correspondence(
        source_local=query_local,
        plane_origin=jnp.where(valid[:, None], plane_origin, 0.0),
        plane_normal=jnp.where(valid[:, None], plane_normal, 0.0),
        valid=valid,
    )


def find_correspondences_indexed(
    m: VoxelMap,
    index: SearchIndex,
    query_local: jax.Array,
    query_valid: jax.Array,
    pose_t: jax.Array,
    pose_R: jax.Array,
    *,
    voxel_size: float,
    max_distance: float,
) -> Correspondence:
    """27-neighborhood nearest-point search against a prebuilt SearchIndex.

    Semantics of reference findMatchingPairs (voxel_grid.h:206-234):
    transform each query by the *current* pose estimate, brute-force
    nearest stored point under a squared-distance gate over the 3x3x3
    neighbor voxels, first-minimum tie-breaking in (voxel scan, insertion)
    order; the winner's stored normal is the matching plane.

    TPU shape: per (x, y) column, ONE directory row-gather yields the
    column's start slot + z-occupancy bitmask; popcount rank-select turns
    that into exact sorted-table slots for z-1/z/z+1. The 9 columns are
    processed with a running best, so the only large intermediates are one
    column's candidates — ~9x less live memory than materializing all 27
    voxels, and no normals gather (the winner's normal is fetched at the
    end, 1 row per query).
    """
    C, K = m.capacity, m.max_points
    Q = query_local.shape[0]
    q_world = query_local @ pose_R.T + pose_t  # (Q, 3)
    max_d2 = np.float32(max_distance * max_distance)

    slots, present = _neighborhood_slots(
        m, index, q_world, query_valid, voxel_size=voxel_size
    )

    rows64 = index.rows64
    kidx = np.arange(K, dtype=np.int32)[None, None, :]  # (1, 1, K)

    # running best over the 9 columns, in reference scan order: strict '<'
    # keeps the earliest column on ties; within a column, argmin keeps the
    # first (z, insertion-order) minimum.
    best_d2 = jnp.full((Q,), max_d2, jnp.float32)
    best_slot = jnp.zeros((Q,), jnp.int32)
    best_k = jnp.zeros((Q,), jnp.int32)
    for c in range(9):
        sl = slots[:, c, :]                       # (Q, 3)
        pr = present[:, c, :]
        rows_c = rows64[sl.reshape(-1)].reshape(Q, 3, -1)  # (Q, 3, width)
        pts_c = rows_c[..., : K * 3].reshape(Q, 3, K, 3)
        cnt_c = rows_c[..., K * 3]                # (Q, 3) float count
        ok = pr[..., None] & (kidx < cnt_c[..., None].astype(jnp.int32))
        diff = pts_c - q_world[:, None, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)        # (Q, 3, K)
        d2 = jnp.where(ok & (d2 < max_d2), d2, max_d2)
        flat = d2.reshape(Q, 3 * K)
        loc = jnp.argmin(flat, axis=-1)           # first min in (z, k) order
        loc_d = jnp.take_along_axis(flat, loc[:, None], axis=-1)[:, 0]
        better = loc_d < best_d2
        sl_win = jnp.take_along_axis(sl, (loc // K)[:, None], axis=-1)[:, 0]
        best_slot = jnp.where(better, sl_win, best_slot)
        best_k = jnp.where(better, (loc % K).astype(jnp.int32), best_k)
        best_d2 = jnp.where(better, loc_d, best_d2)

    valid = query_valid & (best_d2 < max_d2)
    best_phys = m.row[best_slot]              # (Q,) winner indirection
    plane_origin = m.pts[best_phys, best_k]   # (Q, 3) — tiny winner gathers
    plane_normal = m.nrm[best_phys, best_k]
    return Correspondence(
        source_local=query_local,
        plane_origin=jnp.where(valid[:, None], plane_origin, 0.0),
        plane_normal=jnp.where(valid[:, None], plane_normal, 0.0),
        valid=valid,
    )


@partial(jax.jit, static_argnames=("voxel_size", "max_distance", "use_pallas"))
def find_correspondences(
    m: VoxelMap,
    query_local: jax.Array,
    query_valid: jax.Array,
    pose_t: jax.Array,
    pose_R: jax.Array,
    *,
    voxel_size: float,
    max_distance: float,
    use_pallas: bool = False,  # kept for API compat; reduction is fused now
) -> Correspondence:
    """One-shot correspondence search (builds the SearchIndex internally).

    For repeated searches against the same map — the ICP loop — build the
    index once with build_search_index and call find_correspondences_indexed.
    """
    del use_pallas
    index = build_search_index(m)
    return find_correspondences_indexed(
        m, index, query_local, query_valid, pose_t, pose_R,
        voxel_size=voxel_size, max_distance=max_distance,
    )


# ---------------------------------------------------------------------------
# exports (reference getCloud / getCloudWithoutNormals /
# getSparseCloudWithoutNormals, voxel_grid.h:112-162) — host-side helpers
# ---------------------------------------------------------------------------

def get_cloud(m: VoxelMap):
    """All stored (point, normal) pairs as numpy arrays (voxel_grid.h:112-129)."""
    import numpy as np

    keys = np.asarray(m.keys)
    count = np.asarray(m.count)
    row = np.asarray(m.row)
    pts = np.asarray(m.pts)
    nrm = np.asarray(m.nrm)
    out_p, out_n = [], []
    for i in np.nonzero(keys != np.int32(0x7FFFFFFF))[0]:
        c = count[i]
        r = row[i]
        out_p.append(pts[r, :c])
        out_n.append(nrm[r, :c])
    if not out_p:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    return np.concatenate(out_p), np.concatenate(out_n)


def get_sparse_cloud(m: VoxelMap):
    """One point per voxel (the first stored), numpy (voxel_grid.h:149-162)."""
    import numpy as np

    keys = np.asarray(m.keys)
    sel = keys != np.int32(0x7FFFFFFF)
    return np.asarray(m.anchor)[sel, :]
