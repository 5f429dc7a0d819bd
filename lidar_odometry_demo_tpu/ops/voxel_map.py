"""Sorted fused-row voxel table: the TPU-native replacement for the
reference's hash-voxel grid.

The reference's `VoxelGrid` (src/voxel_grid.h:17-257) is a robin_map from
int64 voxel indices to capped point lists, serving triple duty as
downsampler, keyframe map, and NN-search index. Pointer-chasing hash tables
don't map to TPUs; this module re-designs the structure as ONE fixed-
capacity int32 table sorted by a packed voxel key:

- voxel coords quantized by truncation toward zero — reproducing the
  reference's `(int64)(x / voxel_size)` quirk where the 8 voxels around the
  origin merge (voxel_grid.h:68-75),
- coords packed into a single int32 key (11/11/9 bits for x/y/z) relative
  to a rebasable integer origin; the radius-evicted map (80 m) always fits,
- EVERYTHING about a voxel lives in one 128-lane row (one TPU lane tile) of a single (C, W)
  int32 array `tab` — stored points (f32 bitcast, PLANAR x/y/z lane
  blocks), the count (stored f32: search rows carry it), normals, then
  key/anchor. One array = one layout: per-scan maintenance is one fused
  flat element scatter for the incoming points, ONE (C+N_in) key sort
  that also carries the post-update key/count vectors, and ONE C-row
  merge gather with the key/count lanes stamped from the sorted vectors.
  (Round-2's physical-row indirection was measured pathological at
  batch 8: scatters into a 4-D (B,C,K,3) payload lowered to full-array
  copies, layout transposes, and serialized while-loops — ~8 ms/lane-scan
  of payload rewriting in the xplane trace.)
- the candidate rows the 27-neighborhood search gathers are a pure SLICE
  of `tab` (no per-scan gather), pre-concatenated into z-triple rows so
  each query column costs ONE gather row instead of three (gathers on
  this TPU are row-count bound at ~85M rows/s batched; the 3x-wider row
  is free — measured 2.6 -> 1.2 ms/lane at batch 8).

Per-voxel semantics match the reference: capacity-capped point lists that
keep the first `max_points` arrivals and drop overflow (voxel_grid.h:77-93),
the first stored point acting as the eviction anchor (voxel_with_planes.h:32),
and 27-neighborhood brute-force nearest-point search under a distance gate
returning the stored normal as the matching plane (voxel_grid.h:164-204).
One deliberate deviation: when live voxels would exceed capacity, the
table keeps the C smallest keys (the reference's robin_map grows without
bound). Dense long drives DO saturate the default capacity (the bench
simulator fills 131072 slots by scan ~82; ATE stays ~0.015 m because
radius eviction keeps the working set near the sensor, so the drop hits
the fringe) — saturation is observable as map_voxels == capacity
(StepDiagnostics / the CLI's "map_saturated" flag); raise map_capacity
for fringe-complete maps at C-proportional per-scan cost.
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


def _align8(n: int) -> int:
    return -(-n // 8) * 8


def _lanes(K: int):
    """Lane layout of one table row for max_points = K (format v6).

    [0 : K)             stored point x coords, f32 bitcast (PLANAR)
    [K : 2K)            stored point y coords, f32 bitcast
    [2K : 3K)           stored point z coords, f32 bitcast
    [3K]                the count, stored as f32 bitcast — the SEARCH
                        copy: candidate rows carry it and the match gates
                        lanes on it (values <= K are exact in f32). The
                        authoritative count is the VoxelMap.count vector;
                        rows of evicted voxels may hold a stale lane (they
                        are unreachable: the directory only indexes live
                        keys).
    [RW : RW + 3K)      stored normals, f32 bitcast interleaved (x,y,z)
                        per point;  RW = align8(3K + 1)
    [MB : MB + 3)       anchor = first stored point, f32 bitcast;
                        MB = RW + 3K
    width W = align8(MB + 3)

    The packed voxel key is NOT in the row (it was, through format v5):
    keys and counts live as separate (C,) vectors in VoxelMap, because
    they fall out of the per-scan merge sort for free — stamping them
    back into table lanes cost a 0.44 ms/scan 5-way full-table
    concatenate (r5 xplane trace), the single largest above-floor op in
    map_update.

    Points are PLANAR (xx..yy..zz), not interleaved: the correspondence
    match then reads each coordinate as a contiguous lane slice of the
    gathered candidate row — the r3 interleaved layout forced XLA to
    materialize (Q, 27, K, 3)/(Q, 540, 3) re-tiled copies of the whole
    candidate cache (~1.9 ms/scan of pure layout churn in the r3 xplane
    trace, plus 0.12 ms per ICP round). Normals stay interleaved: only
    the per-query winner is ever read (a 3-element gather).

    For the default K = 20 this is exactly W = 128 — ONE TPU lane tile.
    An earlier layout carried a redundant int32 count lane, making
    W = 136, which the (8, 128) tiling pads to 256 lanes: every
    full-table pass (meta rebuild, insert scatter, merge gather) moved
    1.88x the real bytes. Keep W a multiple of 128 when changing K.
    """
    RW = _align8(3 * K + 1)
    MB = RW + 3 * K
    W = _align8(MB + 3)
    return RW, MB, W


class VoxelMap(NamedTuple):
    """Fixed-capacity voxel table, rows sorted by packed key.

    tab:    (C, W) int32 fused rows (see _lanes). Sorted order is
            maintained by construction: rebase is a uniform key shift
            (order-preserving) and insertion ends with a merge gather by
            the sorted order of (old keys ++ fresh keys).
    keys:   (C,) int32 packed voxel key per row; EMPTY_KEY pads the tail.
            A separate vector, not a table lane (format v6): it falls out
            of the per-scan merge sort for free, whereas stamping it back
            into a lane cost a 0.44 ms/scan full-table concatenate.
    count:  (C,) int32 stored-point count per row (authoritative; the f32
            lane at 3K inside each row is the search copy, stamped for
            touched rows by the insert scatter).
    origin: (3,) int32 integer-index origin the keys are relative to.
    kdim:   (1, K) int32 marker carrying max_points statically (the lane
            layout is not invertible from W alone; one row rather than
            zero because orbax refuses zero-size arrays).
    """

    tab: jax.Array
    keys: jax.Array
    count: jax.Array
    origin: jax.Array
    kdim: jax.Array

    @property
    def max_points(self) -> int:
        return self.kdim.shape[-1]

    @property
    def capacity(self) -> int:
        return self.tab.shape[-2]

    @property
    def anchor(self) -> jax.Array:
        _, MB, _ = _lanes(self.max_points)
        return jax.lax.bitcast_convert_type(
            self.tab[..., MB : MB + 3], jnp.float32)

    @property
    def pts(self) -> jax.Array:
        K = self.max_points
        planar = jax.lax.bitcast_convert_type(
            self.tab[..., : 3 * K], jnp.float32
        ).reshape(*self.tab.shape[:-1], 3, K)
        return jnp.swapaxes(planar, -1, -2)  # (..., K, 3)

    @property
    def nrm(self) -> jax.Array:
        K = self.max_points
        RW, _, _ = _lanes(K)
        return jax.lax.bitcast_convert_type(
            self.tab[..., RW : RW + 3 * K], jnp.float32
        ).reshape(*self.tab.shape[:-1], K, 3)


class Correspondence(NamedTuple):
    """Match of a query point against the map (voxel_grid.h:40-46)."""

    source_local: jax.Array  # (Q, 3) query point in its local frame
    plane_origin: jax.Array  # (Q, 3) matched stored point
    plane_normal: jax.Array  # (Q, 3) matched stored normal
    valid: jax.Array         # (Q,)


def _rot_pts_exact(pts: jax.Array, R: jax.Array) -> jax.Array:
    """pts @ R.T as exact elementwise VPU math (the @ operator's default
    MXU precision is bfloat16 on TPU — ~8 mantissa bits on world
    coordinates; see ops/icp._rot_pts)."""
    return jnp.stack(
        [pts[..., 0] * R[i, 0] + pts[..., 1] * R[i, 1] + pts[..., 2] * R[i, 2]
         for i in range(3)], axis=-1)


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
    directory misses — this is what makes the index-accelerated insert
    safe (a directory miss is then always a true miss; an out-of-window
    point can never alias an in-table key and insert a duplicate). At the
    0.2 m keyframe voxel the windows are +-25.6 m vertical (beyond VLP16
    reach: +-15 deg at 80 m = +-20.7 m) and +-102.4 m horizontal (beyond
    the 80 m radius eviction + rebase). Scan-local downsample grids keep
    the full 11/11/9-bit range (needed at 0.1 m).
    """
    rel = idx - origin
    rx = rel[..., 0] + _XOFF
    ry = rel[..., 1] + _YOFF
    rz = rel[..., 2] + _ZOFF
    # run the ~15-op packing chain in (N//128, 128) 2-D block form when
    # the flat size allows: 1-D T(1024) elementwise ops cost ~0.015 ms
    # EACH on this chip regardless of size, vs effectively free in
    # T(8, 128) 2-D (r5 A/B); this chain runs four times per scan
    blocked = (rx.ndim == 1 and rx.shape[0] % 128 == 0
               and rx.shape[0] >= 128)
    if blocked:
        rx, ry, rz = (v.reshape(-1, 128) for v in (rx, ry, rz))
        valid = valid.reshape(-1, 128)
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
    out = jnp.where(valid & in_range, key, EMPTY_KEY)
    return out.reshape(-1) if blocked else out


def _shift_key(delta: jax.Array) -> jax.Array:
    """Key-space shift corresponding to an origin move by integer `delta`.

    Subtracting this constant from every valid key re-bases the whole table
    without re-sorting (a uniform shift preserves lexicographic order as
    long as coordinates stay in range, which radius eviction guarantees).
    """
    return (delta[0] << (_YB + _ZB)) + (delta[1] << _ZB) + delta[2]


def map_init(capacity: int, max_points: int) -> VoxelMap:
    # capacity % 16 == 0: the packed search-index desc stores 16 slots
    # per 128-lane row (see SearchIndex.desc); spatial shard capacities
    # must also be 16-divisible so composite desc rows stay slot-aligned
    assert capacity % 16 == 0, f"map capacity must be 16-divisible, got {capacity}"
    _, _, W = _lanes(max_points)
    return VoxelMap(
        tab=jnp.zeros((capacity, W), jnp.int32),
        keys=jnp.full((capacity,), EMPTY_KEY, jnp.int32),
        count=jnp.zeros((capacity,), jnp.int32),
        origin=jnp.zeros((3,), jnp.int32),
        kdim=jnp.zeros((1, max_points), jnp.int32),
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

    Runs the shift/compare/scan in (n//128, 128) 2-D block form when the
    size allows (1-D elementwise/scan ops cost ~0.015 ms each on this
    chip — r5 A/B); results return flat for the callers' gathers.
    """
    n = sorted_keys.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    if n % 128 == 0 and n >= 128:
        k2 = sorted_keys.reshape(-1, 128)
        pos2 = pos.reshape(-1, 128)
        valid = k2 != EMPTY_KEY
        leader = valid & (k2 != _flat_shift1(k2, EMPTY_KEY))
        x = jnp.where(leader, pos2, -1)
        m1 = jax.lax.associative_scan(jnp.maximum, x, axis=1)
        carry = jax.lax.associative_scan(jnp.maximum, m1[:, -1])
        prefix = jnp.concatenate(
            [jnp.full((1,), np.int32(-1)), carry[:-1]])[:, None]
        start = jnp.maximum(m1, prefix)
        return (leader.reshape(-1), (pos2 - start).reshape(-1),
                start.reshape(-1))
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

@partial(jax.jit, static_argnames=("voxel_size", "budget", "with_overflow"))
def downsample(pts: PointsWithNormals, voxel_size: float, budget: int,
               with_overflow: bool = False):
    """1-point-per-voxel downsampling keeping the first point per voxel in
    input order (reference addCloud with max_points=1, voxel_grid.h:77-93),
    compacted to a fixed `budget`.

    Scan-local: uses a zero origin; inputs must be within the key window
    (true after the 80 m range gate).

    with_overflow=True additionally returns the number of voxel leaders
    DROPPED because they exceeded `budget` (int32 scalar) — a dense scene
    with more occupied voxels than the static budget would otherwise
    silently lose matching/update coverage (VERDICT r4 weak #5). The
    leaders kept are the `budget` smallest keys, not the first in input
    order — acceptable because overflow is an off-nominal condition the
    counter exists to surface.
    """
    n = pts.capacity
    take = min(budget, n)
    pad = budget - take
    zero_origin = jnp.zeros((3,), jnp.int32)
    keys = pack_keys(voxel_indices(pts.xyz, voxel_size), zero_origin, pts.valid)
    # one multi-operand sort carries the permutation with the keys: the
    # jnp.argsort + keys[order] form pays a ~0.19 ms 1-D element gather
    # at the planar shape (and an 8-lane row-gather disguise gets
    # narrowed back to a scalar gather by XLA since only lane 0 is used)
    sorted_keys, order = jax.lax.sort(
        (keys, jnp.arange(n, dtype=jnp.int32)),
        num_keys=1, is_stable=True)  # ties keep input order
    leader, _, _ = _group_structure(sorted_keys)
    n_leaders = jnp.sum(leader.astype(jnp.int32))
    # compact leaders to the front (stable: stays in key order). The two
    # compaction reads ride ONE 8-lane row gather of a packed
    # [order | leader] array: separate 1-D element gathers run ~150 M
    # elem/s on this chip (~0.1 ms each at scan shapes) where row
    # gathers of small row-major sources are ~5x faster (r5 trace).
    comp = jnp.argsort(~leader, stable=True)[:take]
    packed = jnp.concatenate(
        [order[:, None], leader.astype(jnp.int32)[:, None],
         jnp.zeros((n, 6), jnp.int32)], axis=1)
    g = packed[comp]
    src = g[:, 0]
    ok = (g[:, 1] != 0) & (jnp.arange(take) < n_leaders)
    # one fused [xyz | normal] row gather instead of two (n, 3) gathers
    pn = jnp.concatenate(
        [pts.xyz, pts.normal, jnp.zeros((n, 2), pts.xyz.dtype)], axis=1)
    gp = jnp.where(ok[:, None], pn[src], 0.0)
    out = PointsWithNormals(xyz=gp[:, :3], normal=gp[:, 3:6], valid=ok)
    if pad:
        out = PointsWithNormals(
            xyz=jnp.concatenate([out.xyz, jnp.zeros((pad, 3), out.xyz.dtype)]),
            normal=jnp.concatenate([out.normal, jnp.zeros((pad, 3), out.normal.dtype)]),
            valid=jnp.concatenate([out.valid, jnp.zeros((pad,), bool)]),
        )
    if with_overflow:
        return out, jnp.maximum(n_leaders - take, 0)
    return out


# ---------------------------------------------------------------------------
# column-directory geometry (shared by the search index and lookups)
# ---------------------------------------------------------------------------

# np.array (inlined literal), not jnp — see EMPTY_KEY note. Column scan
# order (dx, dy ascending) x (z-1, z, z+1) reproduces the reference's
# ix/iy/iz neighbor order (voxel_grid.h:175-177) for tie-breaking.
_COLUMN_OFFSETS = np.array(
    [[ix, iy, 0] for ix in (-1, 0, 1) for iy in (-1, 0, 1)], np.int32
)  # (9, 3)

# The directory is a dense (2^GB, 2^GB) grid over the (x, y) column space
# centered on the key window's midpoint: gx = rx - (XOFF - GHALF). Every
# voxel the radius-evicted map can hold (<= ~405 voxels from origin at
# 0.2 m / 80 m) and every gated query (<= ~406) falls inside GHALF = 512,
# so directory misses are exactly the true misses.
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

_PTR_EMPTY = np.int32(0x7FFFFFFF)



class SearchIndex(NamedTuple):
    """Per-scan acceleration structure for the 27-neighborhood search.

    The voxel table is frozen for the whole ICP loop, so we precompute once:

    dense: (_NROW2 + 1, 8) int32 — the column pointer grid in 2-D
        T(8, 128)-tiled form: the (x, y) cell space is front-padded by 8
        (padded cell p = gx*G + gy + 8) and row j holds the sorted-table
        slots of the column leaders at padded cells [8j, 8j + 8)
        (_PTR_EMPTY elsewhere; the final row is all-empty padding so row
        pairs (j, j+1) are always in range). 2-D ON PURPOSE, twice over:
        (a) the r4 flat (G*G+1,) 1-D grid made BOTH ends pathological on
        this chip — the build's 1-D scatter ran at ~134 M elem/s vs ~440
        M for 2-index scatters into T(8,128) arrays, and 1-D<->2-D
        retiling reshapes moved 4 MB at ~27 GB/s (r5 xplane trace); (b)
        lookups become 8-lane ROW gathers + unrolled VPU lane selects —
        measured ~15-35x faster than (Q*9)-element scalar gathers from
        the flat grid (scripts/r05_primitives.py). An 8-aligned row of
        the padded cell space never straddles columns (G = 1024 is
        8-divisible), so the spatial composite selects whole rows by
        owner (parallel/spatial.py).
    desc: (C // 16, 128) int32 — the per-column-leader 256-bit
        z-occupancy bitmasks, PACKED 16 leader slots per 128-lane row:
        slot s's ZWORDS words live at row s >> 4, lanes
        [(s & 15) * 8, (s & 15) * 8 + 8) (garbage at non-leader slots;
        only leader slots are ever dereferenced). Packed because a
        (C, 8) array tiles to (8, 128) physically — 16x padded, turning
        every init/copy pass into 67 MB (0.3+ ms/scan in the r5 trace);
        the packed form is the real 4 MB. A query resolves voxel
        (x, y, z) to its exact table slot as `ptr + popcount(bits below
        z)` — row gathers + unrolled lane selects + VPU popcounts,
        instead of a 17-step binary search per column (searchsorted
        measured ~4x slower on TPU, and its XLA lowering costs ~10 ms
        per scan in map_update). Requires capacity % 16 == 0 (map_init
        asserts; spatial shard capacities must divide accordingly so
        composite desc rows concatenate slot-aligned).
    rows: (C + 2, RW) int32 — the per-slot search lanes
        ([pts planar | cnt_f], RW lanes, f32 bitcast) + 2 zero pad rows.
        The neighborhood search gathers the (z-1, z, z+1) voxels of a
        column as THREE narrow row gathers at slots base/base+1/base+2:
        64-lane rows gather at ~677 M rows/s on this chip vs ~90 M rows/s
        for the r4 192-lane z-triple rows (scripts/r05_primitives.py), so
        3x the row count is 2.5x FASTER — and the 0.5 ms/scan triple-row
        build disappears (this is a plain slice of tab).
    """

    dense: jax.Array
    desc: jax.Array
    rows: jax.Array


# dense grid geometry: cells are looked up in a front-padded space
# p = cell + 8 so that cell -1 (gy = 0's dy = -1 neighbor) still lands in
# a valid row; row j covers padded cells [8j, 8j + 8).
_NROW2 = (_G * _G) // 8 + 1


def _lane_select(rows8a, rows8b, lane0, n_out: int):
    """Values at virtual lanes lane0 .. lane0+n_out-1 of the 16-lane
    window [rows8a | rows8b], via unrolled VPU selects (lane0 in [0, 8))."""
    outs = []
    for d in range(n_out):
        v = jnp.full(lane0.shape, _PTR_EMPTY, jnp.int32)
        for l in range(8):
            src = rows8a[..., l + d] if l + d < 8 else rows8b[..., l + d - 8]
            v = jnp.where(lane0 == l, src, v)
        outs.append(v)
    return outs


def _gather_zwords(index: "SearchIndex", slot_flat: jax.Array,
                   got: jax.Array) -> list:
    """Leader slots -> their z-occupancy masks as a LIST of _ZWORDS
    (N,)-shaped word vectors (never a minor-dim-8 array — see the desc
    packing note in SearchIndex). `got` masks absent columns to 0."""
    row = index.desc[jax.lax.shift_right_logical(slot_flat, 4)]  # (N, 128)
    sub = slot_flat & 15
    words = []
    for w in range(_ZWORDS):
        v = jnp.zeros(slot_flat.shape, jnp.int32)
        for s16 in range(16):
            v = jnp.where(sub == s16, row[..., (s16 << 3) + w], v)
        words.append(jnp.where(got, v, 0))
    return words


def _search_rows(tab: jax.Array, RW: int) -> jax.Array:
    """(C, W) table -> (C + 2, RW) padded search-lane rows (pure slice)."""
    return jnp.concatenate(
        [tab[:, :RW], jnp.zeros((2, RW), jnp.int32)], axis=0)


def _flat_shift1(x2: jax.Array, fill) -> jax.Array:
    """Flat shift-by-one of a (R, 128) 2-D view: out.flat[i] = x.flat[i-1]
    (out.flat[0] = fill), expressed as a lane shift with the row boundary
    carried through lane 127 of the previous row — keeps the whole op in
    T(8, 128) 2-D form (1-D concatenate/slice chains run ~15-30x slower
    on this chip; scripts r5 1-D/2-D A/B)."""
    carry = jnp.concatenate(
        [jnp.full((1,), fill, x2.dtype), x2[:-1, -1]])[:, None]  # (R, 1)
    return jnp.concatenate([carry, x2[:, :-1]], axis=1)


def build_search_index(m: VoxelMap) -> SearchIndex:
    """Build the per-scan column directory + candidate row view.

    Every (C,)-sized elementwise chain runs in (C//128, 128) 2-D block
    form: 1-D T(1024) elementwise ops measured ~33 GB/s per pass on this
    chip vs effectively free in T(8, 128) 2-D (r5 A/B) — the chains here
    cost ~0.3 ms/scan as 1-D. Tiny test tables (C % 128 != 0) keep the
    1-D path. The leader-start max-scan is BLOCKED in 2-D: scan within
    rows, scan the row carries, combine.
    """
    C, K = m.capacity, m.max_points
    RW, _, _ = _lanes(K)
    two_d = C % 128 == 0
    keys = m.keys.reshape(-1, 128) if two_d else m.keys
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
    iota = jnp.arange(C, dtype=jnp.int32)
    if two_d:
        iota = iota.reshape(-1, 128)
        prev = _flat_shift1(colkey, np.int32(-1))
        prev_win = _flat_shift1(in_win, False)
        leader = in_win & ((colkey != prev) | ~prev_win)
        # blocked max-scan for the per-element leader slot
        x = jnp.where(leader, iota, -1)
        m1 = jax.lax.associative_scan(jnp.maximum, x, axis=1)
        row_carry = jax.lax.associative_scan(jnp.maximum, m1[:, -1])
        row_prefix = jnp.concatenate(
            [jnp.full((1,), np.int32(-1)), row_carry[:-1]])
        start = jnp.maximum(m1, row_prefix[:, None])
    else:
        prev = jnp.concatenate([jnp.array([-1], jnp.int32), colkey[:-1]])
        leader = in_win & ((colkey != prev)
                           | ~jnp.concatenate([jnp.array([False]),
                                               in_win[:-1]]))
        start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(leader, iota, -1))

    # dense pointer grid: one 2-index scatter into the (row, lane) form
    # (leaders only; one per column). Distinct leader cells -> distinct
    # (row, lane) targets; masked entries get distinct OOB rows so the
    # uniqueness promise holds. Flat 1-D scatters into a (G*G,) grid ran
    # ~4x slower on this chip and forced 1-D<->2-D retiling passes
    # downstream (r5 xplane trace) — stay 2-D end to end. The scatter
    # index/value arrays keep the 2-D block shape (same element count).
    p = cell + 8                                  # front-padded cell space
    dense = jnp.full((_NROW2 + 1, 8), _PTR_EMPTY, jnp.int32)
    dense = dense.at[
        jnp.where(leader, jax.lax.shift_right_logical(p, 3),
                  _NROW2 + 1 + iota),
        p & 7,
    ].set(iota, mode="drop", unique_indices=True)

    # compact z-occupancy at leader slots: one 2-index scatter-add into
    # the PACKED (C//16, 128) form (z unique per voxel within a column,
    # so add == or; bit 31 wraps to int32 min — the right bit pattern;
    # int32 throughout, see EMPTY_KEY). Masked entries get distinct OOB
    # rows (dropped). A segmented-scan formulation was A/B'd on chip in
    # r4/r5 and lost both times (r5: 16.1 vs 14.0 ms/scan end-to-end).
    word = jnp.where(in_win, jax.lax.shift_right_logical(zd, 5), 0)
    bit = jax.lax.shift_left(jnp.int32(1), zd & 31)
    desc = jnp.zeros((C // 16, 128), jnp.int32)
    desc = desc.at[
        jnp.where(in_win, jax.lax.shift_right_logical(start, 4),
                  C // 16 + iota),
        ((start & 15) << 3) + word,
    ].add(jnp.where(in_win, bit, 0), mode="drop")

    return SearchIndex(dense=dense, desc=desc,
                       rows=_search_rows(m.tab, RW))


def _popcount_below(zwords: list, z: jax.Array) -> jax.Array:
    """Number of set bits strictly below bit index z (vectorized rank).

    zwords: list of _ZWORDS (...)-shaped int32 word vectors (see
    _gather_zwords); z: (...) int32 in [0, 2*_DIR_ZHALF).
    """
    word = jax.lax.shift_right_logical(z, 5)
    bit = z & 31
    # mask of bits below `bit` within z's word
    low = jax.lax.shift_left(jnp.int32(1), bit) - 1  # bit==31 wraps to -1+.. ok:
    # shift_left(1, 31) = int32 min; min - 1 = 0x7FFFFFFF = bits 0..30 ✓
    total = jnp.zeros(z.shape, jnp.int32)
    for w in range(_ZWORDS):
        mw = zwords[w]
        sel_full = w < word
        sel_part = w == word
        masked = jnp.where(sel_part, mw & low, jnp.where(sel_full, mw, 0))
        total = total + jax.lax.population_count(masked)
    return total


def _zbit(zwords: list, z: jax.Array) -> jax.Array:
    """Whether bit z is set; z outside the directory window -> False."""
    ok = (z >= 0) & (z < 2 * _DIR_ZHALF)
    zc = jnp.clip(z, 0, 2 * _DIR_ZHALF - 1)
    word = jax.lax.shift_right_logical(zc, 5)
    bit = zc & 31
    w = jnp.zeros(z.shape, jnp.int32)
    for wi in range(_ZWORDS):  # unrolled select — no gather
        w = jnp.where(word == wi, zwords[wi], w)
    return ok & (jax.lax.shift_right_logical(w, bit) & 1).astype(bool)


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
    # dense-grid row gather + unrolled lane select (a scalar gather from
    # a flat 1M grid runs ~15x slower — scripts/r05_primitives.py)
    cidx = gx * _G + gy + 8                  # front-padded cell space
    j = jnp.clip(jax.lax.shift_right_logical(
        jnp.maximum(cidx, 0), 3), 0, _NROW2)
    lane = cidx & 7
    row8 = index.dense[j]                    # (N, 8)
    start = jnp.full(cidx.shape, _PTR_EMPTY, jnp.int32)
    for l in range(8):
        start = jnp.where(lane == l, row8[..., l], start)
    start = jnp.where(in_win, start, _PTR_EMPTY)
    got = start != _PTR_EMPTY
    start_c = jnp.where(got, start, 0)
    zwords = _gather_zwords(index, start_c, got)
    zc = jnp.clip(z, 0, 2 * _DIR_ZHALF - 1)
    pos = start_c + _popcount_below(zwords, zc)
    found = in_win & got & _zbit(zwords, zc)
    pos = jnp.where(found, jnp.minimum(pos, C - 1), C - 1)
    return pos, found


# ---------------------------------------------------------------------------
# fused per-scan maintenance: evict + rebase + insert with ONE sort and ONE
# row gather (reference radiusCleanup + addCloud, voxel_grid.h:236-246,77-93)
# ---------------------------------------------------------------------------

def _update_impl(
    m: VoxelMap,
    new: PointsWithNormals,
    new_origin: jax.Array,
    evict: jax.Array | None,
    voxel_size: float,
    index: SearchIndex | None,
) -> VoxelMap:
    """Shared evict+insert body.

    1. The post-update keys and counts are computed as (C+N_in,) VECTORS:
       keys uniformly shifted to the new origin, evicted voxels
       tombstoned (count 0; key kept so a same-scan re-insert reuses the
       row — the reference's erase-then-reinsert, voxel_grid.h:236-246 +
       77-93) or dropped to EMPTY if no incoming point touches them.
       No table-wide meta rebuild: the vectors ride the merge sort and
       are stamped into the gathered rows' key/count lanes afterwards
       (two fused column writes). The previous design rebuilt the meta
       lanes with a full (C, W) concatenate — 0.48 ms/scan of pure copy
       in the r4 xplane trace.
    2. Incoming points (sorted by key; stable sort keeps input order so
       first-come-kept capping is deterministic) are written into an
       extended row space [tab ++ fresh rows] with one fused flat element
       scatter (points, normals, anchors, per-leader f32 count lanes):
       found groups append into their existing row at lanes [count..K),
       fresh groups build their row at C + leader.
    3. ONE sort of the (C + N_in) key vector (carrying the row permutation
       and count vector) and ONE (C,)-row gather permute the extended rows
       back into a sorted C-row table. The new keys/count VECTORS are
       prefixes of the sort outputs — free; nothing is stamped back into
       table lanes (the r5 5-way lane concatenate cost 0.444 ms/scan,
       4x its stream floor). At capacity overflow the C smallest keys win
       (documented deviation; the reference grows).
    """
    C, K = m.capacity, m.max_points
    RW, MB, W = _lanes(K)

    shift = _shift_key(new_origin - m.origin)
    blocked = C % 128 == 0 and C >= 128
    r2 = lambda v: v.reshape(-1, 128) if blocked else v
    old_keys = r2(m.keys)
    occupied = old_keys != EMPTY_KEY
    keys1 = jnp.where(occupied, old_keys - shift, EMPTY_KEY)
    if evict is None:
        count1 = r2(m.count)
        evicted = jnp.zeros_like(occupied)
    else:
        evicted = occupied & r2(evict)
        count1 = jnp.where(evicted, 0, r2(m.count))

    # --- sort incoming by key (stable: input order within voxel) ---
    n_in = new.xyz.shape[0]
    keys_in = pack_keys(voxel_indices(new.xyz, voxel_size), new_origin,
                        new.valid, map_window=True)
    order_in = jnp.argsort(keys_in, stable=True)
    # ONE 8-lane row gather fetches key+point+normal per sorted element
    # ([key | xyz | nrm | pad]): the separate keys_in[order_in] element
    # gather alone cost ~0.08 ms (1-D gathers run ~150 M elem/s here)
    bits_in = lambda f: jax.lax.bitcast_convert_type(f, jnp.int32)
    packed_in = jnp.concatenate(
        [keys_in[:, None], bits_in(new.xyz), bits_in(new.normal),
         jnp.zeros((n_in, 1), jnp.int32)], axis=1)
    sorted_in = packed_in[order_in] if n_in else packed_in
    skeys = sorted_in[:, 0]
    sxyz = jax.lax.bitcast_convert_type(sorted_in[:, 1:4], jnp.float32)
    snrm = jax.lax.bitcast_convert_type(sorted_in[:, 4:7], jnp.float32)
    leader, rank, start = _group_structure(skeys)
    valid_e = skeys != EMPTY_KEY

    # --- locate each group in the OLD table layout ---
    keys1_flat = keys1.reshape(-1) if blocked else keys1
    if index is not None:
        pos_c, found = _directory_lookup(m, index, sxyz, valid_e, voxel_size)
        found = found & (keys1_flat[pos_c] == skeys)  # belt & braces (cheap)
    else:
        pos = jnp.searchsorted(keys1_flat, skeys).astype(jnp.int32)
        pos_c = jnp.minimum(pos, C - 1)
        found = valid_e & (keys1_flat[pos_c] == skeys)

    # which old rows get re-touched (tombstone reuse detection); the
    # scatter targets the 2-D block form when available (1-D scatters
    # are the slow path on this chip)
    if blocked:
        touched = jnp.zeros((C // 128, 128), bool).at[
            jnp.where(leader & found,
                      jax.lax.shift_right_logical(pos_c, 7),
                      C // 128 + jnp.arange(n_in, dtype=jnp.int32)),
            pos_c & 127,
        ].set(True, mode="drop", unique_indices=True)
    else:
        touched = jnp.zeros((C,), bool).at[
            jnp.where(leader & found, pos_c,
                      C + jnp.arange(n_in, dtype=jnp.int32))
        ].set(True, mode="drop", unique_indices=True)
    live = (occupied & ~evicted) | touched
    keys2 = jnp.where(live, keys1, EMPTY_KEY)
    count1 = jnp.where(touched & evicted, 0, count1)  # reused tombstones
    keys2 = keys2.reshape(-1) if blocked else keys2
    count1 = count1.reshape(-1) if blocked else count1

    # --- extended row space: raw old rows ++ zero fresh rows (key and
    # count lanes are stamped from the sorted vectors after the merge
    # gather, so no meta rebuild pass over the table) ---
    tab_ext = jnp.concatenate(
        [m.tab, jnp.zeros((n_in, W), jnp.int32)], axis=0)
    total_rows = C + n_in

    # --- per-element write positions (leader broadcast as ONE row gather
    # of a packed [base | ext_slot] array — see the sorted_in note) ---
    base_l = jnp.where(found, count1[pos_c], 0)
    ext_l = jnp.where(found, pos_c, C + start)
    bs = jnp.concatenate(
        [base_l[:, None], ext_l[:, None], jnp.zeros((n_in, 6), jnp.int32)],
        axis=1)
    g_bs = bs[start] if n_in else bs
    base = g_bs[:, 0]
    ext_slot = g_bs[:, 1]
    write_idx = base + rank
    keep = valid_e & (write_idx < K)

    # per-leader: counts (int + float lanes), fresh keys, anchors
    n = n_in
    prev_key = jnp.concatenate([jnp.array([EMPTY_KEY], skeys.dtype), skeys[:-1]])
    boundary = jnp.concatenate([jnp.array([True]), (skeys != prev_key)[1:]])
    nxt = jax.lax.associative_scan(
        jnp.minimum,
        jnp.where(boundary, jnp.arange(n, dtype=jnp.int32), n),
        reverse=True,
    )
    nxt_strict = jnp.concatenate([nxt[1:], jnp.array([n], jnp.int32)])
    group_size = jnp.where(leader, nxt_strict - jnp.arange(n, dtype=jnp.int32), 0)
    new_count = jnp.minimum(K, base + group_size)
    anch = leader & (base == 0)

    # ONE fused (row, lane) element scatter for the three in-row write
    # groups — points, normals, anchors (keys and counts travel as
    # vectors through the sort instead). Every kept target lane is
    # written at most once (points/normals land at distinct (slot, k) in
    # disjoint lane ranges, anchors at distinct slots); masked entries
    # get DISTINCT out-of-bounds rows so the uniqueness promise holds for
    # them too — declaring uniqueness lets XLA emit the parallel scatter
    # path, and fusing the groups makes the scatter pass over the
    # extended table happen ONCE instead of several times (each separate
    # scatter was a full-buffer rewrite in the r3 xplane trace:
    # ~0.4 ms/lane each at batch 8). 2-D indices on purpose: scattering
    # the flattened table forces (C+n, W) <-> flat retiling copies on TPU.
    l3 = np.arange(3, dtype=np.int32)[None, :]
    b3 = lambda v: jnp.broadcast_to(v[:, None], (n, 3))
    bits = lambda f: jax.lax.bitcast_convert_type(f, jnp.int32)
    # planar point lanes: coord c of point k lives at lane c*K + k
    planar_l = np.arange(3, dtype=np.int32)[None, :] * np.int32(K)
    # the in-row f32 count lane (the SEARCH copy — candidate rows gate
    # lanes on it) rides the same fused scatter, stamped at every leader:
    # found rows grow/reset, fresh rows initialize. Untouched live rows
    # keep their correct lane; evicted-untouched rows keep a stale lane
    # that is unreachable (their key leaves the directory).
    cnt_lane = np.int32(3 * K) + jnp.zeros((n, 1), jnp.int32)
    cnt_val = bits(new_count.astype(jnp.float32))[:, None]
    groups = (
        # (rows, lanes, int32 values, mask)
        (b3(ext_slot), write_idx[:, None] + planar_l, bits(sxyz), b3(keep)),
        (b3(ext_slot), (RW + 3 * write_idx)[:, None] + l3, bits(snrm), b3(keep)),
        (b3(ext_slot), MB + jnp.zeros((n, 1), jnp.int32) + l3,
         bits(sxyz), b3(anch)),
        (ext_slot[:, None], cnt_lane, cnt_val, leader[:, None]),
    )
    rows_all = jnp.concatenate([g[0].reshape(-1) for g in groups])
    lanes_all = jnp.concatenate([g[1].reshape(-1) for g in groups])
    vals_all = jnp.concatenate([g[2].reshape(-1) for g in groups])
    mask_all = jnp.concatenate([g[3].reshape(-1) for g in groups])
    oob = total_rows + jnp.arange(rows_all.shape[0], dtype=jnp.int32)
    rows_all = jnp.where(mask_all, rows_all, oob)
    tab_ext = tab_ext.at[rows_all, lanes_all].set(
        vals_all, mode="drop", unique_indices=True)

    # --- post-update key/count vectors over the extended rows ---
    fresh_keys = jnp.where(leader & ~found & keep, skeys, EMPTY_KEY)
    keys_ext = jnp.concatenate([keys2, fresh_keys])
    count_ext = jnp.concatenate(
        [count1, jnp.zeros((n_in,), count1.dtype)]
    ).at[
        # distinct OOB rows for masked entries keep the uniqueness promise
        jnp.where(leader, ext_slot,
                  total_rows + jnp.arange(n_in, dtype=jnp.int32))
    ].set(new_count, mode="drop", unique_indices=True)

    # --- merge permute: one 3-array sort + one C-row gather. The gather
    # output IS the new table: keys/count live as separate vectors
    # (prefixes of the sort outputs), and the in-row f32 count lane was
    # stamped by the fused scatter above — the previous lane-stamp
    # concatenate cost 0.444 ms/scan (4x its stream floor, r5 xplane) ---
    iota_ext = jnp.arange(total_rows, dtype=jnp.int32)
    sorted_keys, order, sorted_cnt = jax.lax.sort(
        (keys_ext, iota_ext, count_ext), num_keys=1, is_stable=True)
    oc = order[:C]
    gathered = tab_ext[oc]  # ONE full-row gather (lane-sliced gathers
    # lowered to a ~33x degraded mode on this chip — r4 bench bisect)
    return VoxelMap(tab=gathered, keys=sorted_keys[:C], count=sorted_cnt[:C],
                    origin=new_origin, kdim=m.kdim)


@partial(jax.jit, static_argnames=("voxel_size",))
def map_insert(m: VoxelMap, new: PointsWithNormals, *, voxel_size: float) -> VoxelMap:
    """Insert points (world frame) with first-come-kept capping semantics.

    New points join existing voxels only while `count < max_points`
    (drop overflow, voxel_grid.h:88-91); new voxels are merged into the
    sorted table. Deterministic: incoming points are processed in input
    order within each voxel (stable sort), voxels in key order.
    """
    return _update_impl(m, new, m.origin, None, voxel_size, None)


@partial(jax.jit, static_argnames=("radius", "voxel_size"))
def radius_cleanup(m: VoxelMap, center: jax.Array, *, radius: float,
                   voxel_size: float) -> VoxelMap:
    """Erase voxels whose *first stored point* is farther than `radius` from
    `center` (the reference anchors eviction on VoxelWithPlanes::getOrigin,
    voxel_with_planes.h:32-35), then re-base the key origin to the current
    center so the coordinate window tracks the sensor.
    """
    new_origin = voxel_indices(center, voxel_size)
    empty = PointsWithNormals(
        xyz=jnp.zeros((0, 3), jnp.float32),
        normal=jnp.zeros((0, 3), jnp.float32),
        valid=jnp.zeros((0,), bool),
    )
    evict = _evict_mask(m, center, new_origin, radius)
    return _update_impl(m, empty, new_origin, evict, voxel_size, None)


def _evict_mask(m: VoxelMap, center: jax.Array, new_origin: jax.Array,
                radius: float) -> jax.Array:
    """Out-of-radius or outside the rebased directory windows.

    Chains run in (C//128, 128) block form when the capacity allows (1-D
    elementwise ops cost ~0.015 ms each on this chip — r5 A/B)."""
    C = m.capacity
    blocked = C % 128 == 0 and C >= 128
    anchor = m.anchor
    keys = m.keys
    if blocked:
        ax, ay, az = (anchor[:, i].reshape(-1, 128) for i in range(3))
        keys = keys.reshape(-1, 128)
    else:
        ax, ay, az = anchor[:, 0], anchor[:, 1], anchor[:, 2]
    dx = ax - center[0]
    dy = ay - center[1]
    dz = az - center[2]
    d2 = dx * dx + dy * dy + dz * dz
    shift = _shift_key(new_origin - m.origin)
    shifted = keys - shift
    rz = shifted & ((1 << _ZB) - 1)
    rx = jax.lax.shift_right_logical(shifted, _YB + _ZB)
    ry = jax.lax.shift_right_logical(shifted, _ZB) & ((1 << _YB) - 1)
    in_win = (
        (rz >= _DIR_ZLO) & (rz < _DIR_ZLO + 2 * _DIR_ZHALF)
        & (rx >= _XOFF - _GHALF) & (rx < _XOFF + _GHALF)
        & (ry >= _YOFF - _GHALF) & (ry < _YOFF + _GHALF)
    )
    out = (d2 > radius * radius) | ~in_win
    return out.reshape(-1) if blocked else out


@partial(jax.jit, static_argnames=("voxel_size", "radius", "origin_quantum"))
def map_update(
    m: VoxelMap, new: PointsWithNormals, center: jax.Array,
    *, voxel_size: float, radius: float, index: SearchIndex | None = None,
    origin_quantum: int = 1,
) -> VoxelMap:
    """radius_cleanup followed by map_insert, fused to a single sort pass.

    Semantically identical to the reference's per-scan sequence
    (lidar_odometry.cpp:67-70: radiusCleanup then addCloud): evicted voxels
    are tombstoned in place so a same-scan re-insert reuses the row, then
    unreused tombstones drop in the final merge.

    origin_quantum > 1 snaps the rebased origin's x/y down to a multiple of
    the quantum (floor division — deterministic). Used by the spatially
    sharded map (parallel/spatial.py): column ownership `gx mod N` is
    invariant under origin shifts that are multiples of N, so shard
    ownership never changes across rebases and voxels never migrate
    between devices. The origin is then at most quantum-1 voxels from the
    sensor — negligible against the +-512-voxel key window.
    """
    new_origin = voxel_indices(center, voxel_size)
    if origin_quantum > 1:
        q = np.int32(origin_quantum)
        new_origin = new_origin.at[:2].set((new_origin[:2] // q) * q)
    evict = _evict_mask(m, center, new_origin, radius)
    return _update_impl(m, new, new_origin, evict, voxel_size, index)


# ---------------------------------------------------------------------------
# 27-neighborhood correspondence search (reference getCorrespondence /
# findMatchingPairs, voxel_grid.h:164-234)
# ---------------------------------------------------------------------------

def _neighborhood_slots(
    m: VoxelMap,
    index: SearchIndex,
    q_world: jax.Array,
    query_valid: jax.Array,
    *,
    voxel_size: float,
):
    """Slot bases + z-triple structure of each query's 3x3x3 neighborhood.

    Returns (base (9, Q) int32 clamped slot of the first present voxel at
    z >= z-1 in each column, n_present (9, Q) int32 how many of the
    z-1/z/z+1 voxels exist). All per-column arrays are COLUMN-major
    (9, Q), never (Q, 9): the T(8, 128) tile pads a minor dimension of 9
    to 128 lanes, so (Q, 9) arrays cost 14x their real bytes in every
    pass and forced 0.6 ms/scan of relayout copies in the r5 trace;
    (9, Q) keeps the minor dimension at Q = 8192. Column order within
    the 9 is _COLUMN_OFFSETS order, preserving the reference's column
    scan order for tie-breaks. The present voxels occupy slots
    base .. base+n_present-1: within a column the sorted table is in
    ascending z, so SLOT order equals z order — the triple needs no
    reordering, just the count mask (the j-th slot of the triple is a real
    candidate iff j < n_present). The (column, slot) scan order therefore
    matches the reference's (column, z) neighbor order exactly
    (voxel_grid.h:175-177).
    """
    C = m.capacity
    Q = q_world.shape[0]
    base_idx = voxel_indices(q_world, voxel_size) - m.origin  # relative (Q, 3)
    # (9, Q) column coordinates in _COLUMN_OFFSETS order
    gx = base_idx[None, :, 0] + _COLUMN_OFFSETS[:, 0][:, None] + _GHALF
    gy = base_idx[None, :, 1] + _COLUMN_OFFSETS[:, 1][:, None] + _GHALF
    zq = base_idx[:, 2] + _DIR_ZHALF  # (Q,) directory z bit of the query voxel
    col_ok = (
        query_valid[None, :]
        & (gx >= 0) & (gx < _G) & (gy >= 0) & (gy < _G)
    )

    # pointer lookup via the 2-D dense grid: per (query, dx) TWO 8-lane
    # row gathers cover all three dy-adjacent cells (cells c-1, c, c+1
    # always fall inside the 16-lane window starting at cell c-1's
    # 8-block); lanes come out with unrolled VPU selects. Replaces the
    # (Q*9)-element scalar gather from the flat 1M grid — measured
    # 15-35x slower (scripts/r05_primitives.py). Out-of-range columns
    # read garbage lanes but are masked by col_ok.
    gy0 = base_idx[:, 1] + _GHALF                  # (Q,)
    # row-PAIR view: one 16-lane gather per dx instead of two 8-lane
    # gathers at rows j and j+1 — 8-lane row gathers run ~90 M rows/s on
    # this chip, so the six (Q, 8) gathers cost ~0.55 ms/scan and the
    # pairing halves them (the 16-lane concat build is one cheap pass)
    dense2 = jnp.concatenate(
        [index.dense[:-1], index.dense[1:]], axis=1)   # (_NROW2, 16)
    start_cols = []
    for dx in (-1, 0, 1):
        gxd = base_idx[:, 0] + _GHALF + dx
        cidx = gxd * _G + gy0 - 1 + 8              # front-padded cell space
        j = jnp.clip(jax.lax.shift_right_logical(
            jnp.maximum(cidx, 0), 3), 0, _NROW2 - 1)
        lane0 = cidx & 7
        r16 = dense2[j]                            # (Q, 16)
        start_cols.extend(
            _lane_select(r16[..., :8], r16[..., 8:], lane0, 3))  # dy=-1,0,+1
    # (9, Q) in (dx, dy) order — identical to _COLUMN_OFFSETS scan order
    start = jnp.stack(start_cols, axis=0)
    start = jnp.where(col_ok, start, _PTR_EMPTY)
    got = start != _PTR_EMPTY
    start_c = jnp.where(got, start, 0)
    zwords = [w.reshape(9, Q) for w in
              _gather_zwords(index, start_c.reshape(-1), got.reshape(-1))]
    col_ok = col_ok & got

    zq9 = jnp.broadcast_to(zq[None, :], (9, Q))
    rank_m1 = _popcount_below(zwords, jnp.clip(zq9 - 1, 0, 2 * _DIR_ZHALF - 1))
    p_m1 = _zbit(zwords, zq9 - 1) & col_ok
    p_0 = _zbit(zwords, zq9) & col_ok
    p_p1 = _zbit(zwords, zq9 + 1) & col_ok
    base = jnp.where(col_ok, jnp.minimum(start_c + rank_m1, C - 1), C - 1)
    n_present = (p_m1.astype(jnp.int32) + p_0.astype(jnp.int32)
                 + p_p1.astype(jnp.int32))
    return base, n_present


class CandidateSet(NamedTuple):
    """Per-query 27-voxel candidate cache for the ICP loop.

    The map is frozen for the whole ICP solve, and the pose moves by at
    most a few cm between outer iterations, so the 3x3x3 candidate
    neighborhoods barely change. Gathering every candidate row ONCE (at
    the initial-guess pose) and re-evaluating distances against the cached
    points each outer iteration turns the per-iteration random-access
    gather into a linear stream the VPU eats at full bandwidth. The 0.3 m
    distance gate still applies exactly; the only deviation from
    re-searching each iteration is that a query whose pose-updated
    position crosses a voxel boundary keeps its guess-pose neighborhood
    (bounded by the intra-ICP pose motion, << the 0.2 m voxel + 0.3 m gate
    slack — validated against the exact search in
    tests/test_voxel_map.py::test_cached_candidates_match_exact_search and
    trajectory-level vs the oracle in tests/test_oracle_equivalence.py).

    The cache IS the raw gathered rows, in the gather's native int32
    (Q*9, RW) layout — no unpacking. Every per-round consumer slices the
    planar coordinate lanes directly (see _lanes); converting to a
    (Q, 27, K, 3) point tensor here cost ~1.9 ms/scan of re-tiling copies
    in the r3 xplane trace. The three z-slices are SEPARATE narrow
    arrays, not one 3*RW-lane triple row: on this chip 64-lane row
    gathers run ~7.5x faster than 192-lane ones (677 vs 90 M rows/s,
    scripts/r05_primitives.py), so three narrow gathers beat one wide
    gather 2.5x — and no per-scan triple-row build exists at all.

    rows_z:    3-tuple of (9*Q, RW) int32 raw candidate rows for the
               z-1 / z / z+1 slot of each query column, in COLUMN-major
               (9, Q) flat order (see _neighborhood_slots on why (9, Q)
               everywhere); slot s of flat column j is real iff
               s < n_present.reshape(-1)[j]
    base:      (9, Q)  clamped table slot of each column's first present
               voxel at z >= z_query - 1
    n_present: (9, Q)  how many of the z-1/z/z+1 voxels exist (slot s of
               a triple is a real candidate iff s < n_present)
    """

    rows_z: tuple
    base: jax.Array
    n_present: jax.Array


def _gather_neighborhood(m, index, q_world, query_valid, *, voxel_size):
    """Three narrow row gathers per query column -> raw (Q*9, RW)
    candidate row arrays in reference (col, z, insertion) order + triple
    structure.

    The triple stays in SLOT order: within a column the sorted table is
    ascending in z, so slots base..base+n_present-1 are exactly the
    present z-1/z/z+1 voxels in z order — no reorder pass (the
    take_along_axis z-shuffle this replaces cost more than the gather
    itself in the r3 xplane trace: ~3 ms/lane-scan of layout copies at
    batch 8). Slot j of a triple is masked unless j < n_present.
    """
    base, n_present = _neighborhood_slots(
        m, index, q_world, query_valid, voxel_size=voxel_size
    )
    bflat = base.reshape(-1)
    rows_z = tuple(index.rows[bflat + s] for s in range(3))
    return CandidateSet(rows_z=rows_z, base=base, n_present=n_present)


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
    """Materialize every query's 27-voxel candidates (one gather/column)."""
    q_world = _rot_pts_exact(query_local, pose_R) + pose_t
    return _gather_neighborhood(
        m, index, q_world, query_valid, voxel_size=voxel_size
    )


# NOTE on the winner-normal gather in _select_best: it deliberately
# indexes the derived (C, K, 3) normal view with TWO index arrays (a plain
# 3-element XLA gather). The obvious alternative — slicing the normal
# lanes out of the winning tab rows, `m.tab[best_slot, RW:RW+3K]` — lowers
# on this TPU runtime to a SERIALIZED while loop of one (1, 3K)
# dynamic-slice per query inside the ICP outer loop (~10 ms/round at
# Q=8192, measured in the r3 xplane trace: 8192 x rounds dynamic-slice
# events); the two-index gather runs at full gather throughput.


def _select_best(m, cand: CandidateSet, query_local, query_valid,
                 pose_t, pose_R, max_distance: float,
                 use_pallas: bool = False,
                 nrm_view: jax.Array | None = None) -> Correspondence:
    """Nearest candidate under the distance gate at the CURRENT pose.

    First minimum in (column scan, z, insertion) order — candidates are
    laid out (col, z, k), so one flat argmin reproduces the reference's
    tie-breaking (voxel_grid.h:175-196). With use_pallas, the distance
    gate + first-min + winner select run as one fused VMEM kernel
    (ops/pallas/correspondence.py) streaming the raw candidate rows;
    results identical.

    This runs once per ICP outer round, so its lowering matters: the
    candidate coordinates are read as contiguous PLANAR lane slices of
    the raw cached rows (see _lanes — no (Q, 27K, 3) re-tiling copies),
    the winning point comes from per-z-slice Q-row gathers of the compact
    candidate arrays + unrolled lane selects (exact f32 — no einsum: a
    float32 dot_general at default precision runs bfloat16 on the MXU,
    rounding plane_origin world coordinates to ~8 mantissa bits — ADVICE
    r3 #1), best_d2 is the masked min (equal by construction to the
    argmin's value), and the winner normal comes from a full-tab-row
    gather at the winning slot + lane selects.
    """
    Q = cand.base.shape[1]
    K = m.max_points
    RW = cand.rows_z[0].shape[-1]
    C = m.capacity
    q_world = _rot_pts_exact(query_local, pose_R) + pose_t
    max_d2 = np.float32(max_distance * max_distance)
    if use_pallas:
        from lidar_odometry_demo_tpu.ops.pallas.correspondence import (
            match_rows,
        )

        # legacy (Q, 9, 3*RW) triple-row layout for the kernel (built on
        # demand — the flag is off by default, chip A/B says XLA wins)
        rows_legacy = jnp.concatenate(cand.rows_z, axis=1).reshape(
            9, Q, 3 * RW).swapaxes(0, 1)
        plane_origin, loc, best_d2 = match_rows(
            q_world, rows_legacy, cand.n_present.T, max_d2=float(max_d2),
            max_points=K,
        )
        c_idx = (loc // (3 * K)).astype(jnp.int32)
        zk_idx = loc % (3 * K)
    else:
        # Hierarchical first-min, entirely in the gathers' ROW-MAJOR
        # layout: per z-slice array reduce the K lane block to (best d2,
        # best k), then combine z-slices and each query's 9 columns.
        # Equivalent to the flat argmin over (col, z, k) order — strict
        # `<` between z-slices and across columns keeps the FIRST minimum
        # (reference tie-break, voxel_grid.h:175-196) — but never
        # materializes a (Q, 27K) tensor or re-tiles the cache (the
        # (Q,9,3,RW) view cost 0.77 ms/scan of reshape/copy in the r4
        # xplane trace).
        QR = Q * 9
        rs = [jax.lax.bitcast_convert_type(r, jnp.float32)
              for r in cand.rows_z]
        # all (9, Q)-major: flat index = col * Q + q
        qx = jnp.broadcast_to(q_world[None, :, 0], (9, Q)).reshape(QR, 1)
        qy = jnp.broadcast_to(q_world[None, :, 1], (9, Q)).reshape(QR, 1)
        qz = jnp.broadcast_to(q_world[None, :, 2], (9, Q)).reshape(QR, 1)
        npres = cand.n_present.reshape(QR)
        kf = np.arange(K, dtype=np.float32)[None, :]
        ki = np.arange(K, dtype=np.int32)[None, :]
        best_d_row = jnp.full((QR,), max_d2, jnp.float32)
        best_zk_row = jnp.zeros((QR,), jnp.int32)
        for s in range(3):
            r2 = rs[s]
            xs = r2[:, :K]
            ys = r2[:, K : 2 * K]
            zs = r2[:, 2 * K : 3 * K]
            cnt = r2[:, 3 * K]
            ok = (npres > s)[:, None] & (kf < cnt[:, None])
            dx = xs - qx
            dy = ys - qy
            dz = zs - qz
            d2 = dx * dx + dy * dy + dz * dz
            d2 = jnp.where(ok & (d2 < max_d2), d2, max_d2)
            mn = jnp.min(d2, axis=1)
            kw = jnp.min(jnp.where(d2 <= mn[:, None], ki, K - 1), axis=1)
            better = mn < best_d_row        # strict: earlier z wins ties
            best_zk_row = jnp.where(better, s * K + kw, best_zk_row)
            best_d_row = jnp.minimum(best_d_row, mn)
        bd = best_d_row.reshape(9, Q)
        best_d2 = jnp.min(bd, axis=0)
        c_idx = jnp.argmin(bd, axis=0).astype(jnp.int32)  # first min in col order
        # winner z/k via an unrolled 9-way select, NOT take_along_axis:
        # a (Q,)-indexed axis-0 take lowers to a per-element gather
        # (~0.08 ms/round on this chip vs ~free for 9 fused selects)
        bzk = best_zk_row.reshape(9, Q)
        zk_idx = jnp.zeros((Q,), jnp.int32)
        for c in range(9):
            zk_idx = jnp.where(c_idx == c, bzk[c], zk_idx)
        # winner point: fused elementwise one-hot sum over a second pass of
        # the candidate stream. NOT a gather from the rows: ANY gather
        # inside the ICP while_loop measured catastrophic on this chip
        # (75 -> 49 scans/s end-to-end, r5) — the whole point of the
        # candidate cache is that per-round work is pure streaming math.
        # An in-pass one-hot (extracting coordinates next to the d2
        # reduction) was also tried and lost ~0.5 ms/scan: kw is a
        # reduction result, so the lanes get re-read either way and the
        # carried selects are pure overhead.
        win_row = (jnp.broadcast_to(
            jnp.arange(9, dtype=jnp.int32)[:, None], (9, Q))
            == c_idx[None, :]).reshape(QR)
        zk_win = jnp.broadcast_to(zk_idx[None, :], (9, Q)).reshape(QR)
        ox = jnp.zeros((Q,), jnp.float32)
        oy = jnp.zeros((Q,), jnp.float32)
        oz = jnp.zeros((Q,), jnp.float32)
        for s in range(3):
            r2 = rs[s]
            sel = (win_row & (zk_win // K == s))[:, None] & (
                ki == (zk_win % K)[:, None])                 # (QR, K)
            pick = lambda a: jnp.sum(
                jnp.where(sel, a, 0.0).reshape(9, Q, K), axis=(0, 2))
            ox = ox + pick(r2[:, :K])
            oy = oy + pick(r2[:, K : 2 * K])
            oz = oz + pick(r2[:, 2 * K : 3 * K])
        plane_origin = jnp.stack([ox, oy, oz], axis=-1)
    k_idx = (zk_idx % K).astype(jnp.int32)
    valid = query_valid & (best_d2 < max_d2)
    # winner column base via the same unrolled 9-way select (see zk_idx)
    base_win = jnp.zeros((Q,), jnp.int32)
    for c in range(9):
        base_win = jnp.where(c_idx == c, cand.base[c], base_win)
    best_slot = jnp.minimum(base_win + zk_idx // K, C - 1)
    if nrm_view is None:
        nrm_view = m.nrm
    plane_normal = nrm_view[best_slot, k_idx]
    return Correspondence(
        source_local=query_local,
        plane_origin=jnp.where(valid[:, None], plane_origin, 0.0),
        plane_normal=jnp.where(valid[:, None], plane_normal, 0.0),
        valid=valid,
    )


def match_candidates(
    m: VoxelMap,
    cand: CandidateSet,
    query_local: jax.Array,
    query_valid: jax.Array,
    pose_t: jax.Array,
    pose_R: jax.Array,
    *,
    max_distance: float,
    use_pallas: bool = False,
    nrm_view: jax.Array | None = None,
) -> Correspondence:
    """Re-match cached candidates at the current pose (pure streaming).

    `nrm_view`: pass `m.nrm` materialized ONCE outside the ICP loop — the
    view derivation (bitcast + layout pass over the table) otherwise
    re-runs every outer round (see _select_best).
    """
    return _select_best(m, cand, query_local, query_valid, pose_t, pose_R,
                        max_distance, use_pallas=use_pallas,
                        nrm_view=nrm_view)


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
    """
    cand = gather_candidates(
        m, index, query_local, query_valid, pose_t, pose_R,
        voxel_size=voxel_size,
    )
    return _select_best(m, cand, query_local, query_valid, pose_t, pose_R,
                        max_distance)


@partial(jax.jit, static_argnames=("voxel_size", "max_distance"))
def find_correspondences(
    m: VoxelMap,
    query_local: jax.Array,
    query_valid: jax.Array,
    pose_t: jax.Array,
    pose_R: jax.Array,
    *,
    voxel_size: float,
    max_distance: float,
) -> Correspondence:
    """One-shot correspondence search (builds the SearchIndex internally).

    For repeated searches against the same map — the ICP loop — build the
    index once with build_search_index and call find_correspondences_indexed.
    """
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
    keys = np.asarray(m.keys)
    count = np.asarray(m.count)
    pts = np.asarray(m.pts)
    nrm = np.asarray(m.nrm)
    out_p, out_n = [], []
    for i in np.nonzero(keys != np.int32(0x7FFFFFFF))[0]:
        c = count[i]
        out_p.append(pts[i, :c])
        out_n.append(nrm[i, :c])
    if not out_p:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    return np.concatenate(out_p), np.concatenate(out_n)


def get_sparse_cloud(m: VoxelMap):
    """One point per voxel (the first stored), numpy (voxel_grid.h:149-162)."""
    keys = np.asarray(m.keys)
    sel = keys != np.int32(0x7FFFFFFF)
    return np.asarray(m.anchor)[sel, :]
