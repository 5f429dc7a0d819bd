"""LOAM-style planar feature extraction as (rings x width) range-image stencils.

TPU-native rewrite of CloudClassifier::classify (reference
src/utils/cloud_classifier.h:17-168):

1. organize the unordered scan into a fixed (R, W) ring x azimuth image
   (the reference buckets by `point.ring` and azimuth index
   floor((atan2(-y,x)+pi) * W / 2pi), cloud_classifier.h:21-71; its W is the
   dynamic max-points-per-ring, ours is a static config width),
2. curvature over a +/-4 window along the *flattened* image — the reference
   iterates the flattened organized cloud so windows cross ring boundaries
   (cloud_classifier.h:85-106); we reproduce that faithfully with shifts on
   the flattened array,
3. for flat points (curv < 0.05), build a normal from the cross product of
   vectors to the first sufficiently-flat points in the *previous ring*
   within +/-4 columns, scanning outside-in (cloud_classifier.h:109-154).

Everything is masked stencil math on a static image: no sorting, no gather
scatter beyond the initial organize step; ideal VPU shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.ops.cloud import LidarScan, PointsWithNormals


class OrganizedScan(NamedTuple):
    xyz: jax.Array    # (R, W, 3) float32; (0,0,0) for empty cells
    valid: jax.Array  # (R, W) bool — cell has a point


def organize(scan: LidarScan, cfg: OdometryConfig) -> OrganizedScan:
    """Bucket points into the (R, W) ring x azimuth image.

    Matches the reference's indexing (cloud_classifier.h:49-54):
    azimuth = atan2(-y, x) + pi; col = floor(azimuth * W / (2 pi)); points
    with col >= W are dropped. When several points land in one cell the
    *last* one in input order wins (the reference overwrites
    `indexed_row[idx] = point`); we reproduce that with a segment-max over
    the point index, which is also deterministic under parallel scatter.
    """
    R, W = cfg.num_rings, cfg.scan_width
    x, y = scan.xyz[:, 0], scan.xyz[:, 1]
    azimuth = jnp.arctan2(-y, x) + jnp.pi
    col = jnp.floor(jnp.abs(azimuth * W / (2.0 * jnp.pi))).astype(jnp.int32)
    ok = scan.valid & (col < W) & (scan.ring >= 0) & (scan.ring < R)
    cell = scan.ring * W + col
    cell = jnp.where(ok, cell, R * W)  # dump invalid into an overflow cell

    n = scan.capacity
    # winner[cell] = max point index mapping there (last-in-order wins).
    # 2-index scatter into a T(8,128) 2-D grid when the image flattens to
    # whole 128-lane rows (the default 16x1800 does): 1-D scatters run
    # ~115 M elem/s on this chip vs ~3x that for 2-D targets (r5 A/B;
    # this scatter was 0.286 ms/scan as 1-D). The overflow cell becomes
    # an overflow ROW; invalid entries may share it (max tolerates
    # duplicate indices).
    if (R * W) % 128 == 0:
        rows = (R * W) // 128
        w2 = jnp.full((rows + 1, 128), -1, jnp.int32)
        w2 = w2.at[
            jnp.minimum(jax.lax.shift_right_logical(cell, 7), rows),
            cell & 127,
        ].max(jnp.arange(n, dtype=jnp.int32))
        winner = w2[:rows].reshape(-1)
    else:
        winner = jnp.full((R * W + 1,), -1, jnp.int32)
        winner = winner.at[cell].max(jnp.arange(n, dtype=jnp.int32))
        winner = winner[: R * W]
    has = winner >= 0
    # gather the winning points from an 8-lane ROW-major padded copy:
    # XLA lays the raw scan's (n, 3) xyz out column-major (it feeds the
    # elementwise deskew math), and gathering a column-major source runs
    # as three ~150 M elem/s scalar gathers (~0.4 ms/scan, r5 trace);
    # the row-major pad costs one small transpose pass and the row
    # gather runs at the fast row-gather rate
    xyz8 = jnp.concatenate(
        [scan.xyz, jnp.zeros((n, 5), scan.xyz.dtype)], axis=1)
    gathered = xyz8[jnp.maximum(winner, 0)][:, :3]
    xyz = jnp.where(has[:, None], gathered, 0.0)
    return OrganizedScan(xyz=xyz.reshape(R, W, 3), valid=has.reshape(R, W))


def curvature(org: OrganizedScan, cfg: OdometryConfig) -> jax.Array:
    """Curvature per cell over the flattened image (cloud_classifier.h:85-106).

    curv = ||sum_{w=-k..k} p_{i+w} - (2k+1) p_i|| / ||p_i||^2, with cells of
    range^2 < 0.1 (including empty cells, which sit at the origin) marked
    with the invalid value 1000. The first/last k cells of the *flattened*
    array keep their input intensity in the reference; they can never be
    emitted (ring 0 / last columns are excluded downstream) so we mark them
    invalid here.
    """
    k = cfg.curvature_window
    R, W = org.valid.shape
    flat = org.xyz.reshape(R * W, 3)
    # windowed sum via shifted adds (k is small and static: unrolled)
    acc = -flat * (2.0 * k + 1.0)
    for w in range(-k, k + 1):
        acc = acc + jnp.roll(flat, -w, axis=0)
    range_sq = jnp.sum(flat * flat, axis=-1)
    curv = jnp.linalg.norm(acc, axis=-1) / jnp.where(range_sq > 0, range_sq, 1.0)
    curv = jnp.where(range_sq < cfg.min_valid_range_sq, cfg.curvature_invalid_value, curv)
    # flattened-array edges (reference never writes them; mark invalid)
    idx = jnp.arange(R * W)
    curv = jnp.where((idx < k) | (idx >= R * W - k), cfg.curvature_invalid_value, curv)
    return curv.reshape(R, W)


def _first_flat_neighbor(
    prev_xyz: jax.Array, prev_flat: jax.Array, offsets: list[int]
) -> tuple[jax.Array, jax.Array]:
    """Select, per column, the previous-ring point at the first offset (in
    the given priority order) whose cell is sufficiently flat.

    Returns (point (R, W, 3), found (R, W)). Shifts are along the column
    axis; `offsets` are column deltas tried in order.
    """
    found = jnp.zeros(prev_flat.shape, bool)
    pt = jnp.zeros(prev_xyz.shape, prev_xyz.dtype)
    for off in offsets:
        cand_flat = jnp.roll(prev_flat, -off, axis=-1)
        cand_xyz = jnp.roll(prev_xyz, -off, axis=-2)
        take = cand_flat & ~found
        pt = jnp.where(take[..., None], cand_xyz, pt)
        found = found | cand_flat
    return pt, found


def classify(scan: LidarScan, cfg: OdometryConfig) -> tuple[PointsWithNormals, OrganizedScan, jax.Array]:
    """Full classification: returns (planar cloud w/ normals over the (R*W)
    grid, the organized scan, and the curvature image).

    Planar-point emission rules mirror cloud_classifier.h:114-164:
    ring >= 1, col in [k, W-k), curv < 0.05, and both a left and right
    flat neighbor found in the previous ring. The unclassified cloud the
    reference also returns is unused by its pipeline
    (lidar_odometry.cpp:33 uses only `planar`); we expose the masks needed
    to reconstruct it via `curvature` + emission rules instead.
    """
    k = cfg.normals_window
    R, W = cfg.num_rings, cfg.scan_width
    org = organize(scan, cfg)
    curv = curvature(org, cfg)

    flat_mask = curv < cfg.flatness_threshold
    neigh_flat = curv < cfg.flatness_threshold * cfg.neighbor_flatness_factor

    # previous ring data aligned to current ring: shift rows down by one
    prev_xyz = jnp.roll(org.xyz, 1, axis=0)
    prev_flat = jnp.roll(neigh_flat, 1, axis=0)

    # left: scan col-k, col-k+1, ..., col-1 (ascending; first hit wins)
    left_pt, left_found = _first_flat_neighbor(prev_xyz, prev_flat, [-o for o in range(k, 0, -1)])
    # right: scan col+k, col+k-1, ..., col+1 (descending from outside)
    right_pt, right_found = _first_flat_neighbor(prev_xyz, prev_flat, list(range(k, 0, -1)))

    origin = org.xyz
    normal = jnp.cross(left_pt - origin, right_pt - origin)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(nn > 0, nn, 1.0)

    rows = jnp.arange(R)[:, None]
    cols = jnp.arange(W)[None, :]
    in_window = (rows >= 1) & (cols >= k) & (cols < W - k)
    planar_mask = flat_mask & left_found & right_found & in_window & (nn[..., 0] > 0)

    planar = PointsWithNormals(
        xyz=origin.reshape(R * W, 3),
        normal=normal.reshape(R * W, 3),
        valid=planar_mask.reshape(R * W),
    )
    return planar, org, curv


def unclassified_mask(planar_valid: jax.Array, curv: jax.Array, cfg: OdometryConfig) -> jax.Array:
    """(R, W) mask of the reference's `unclassified` output cloud.

    The reference emits every in-window cell that is neither planar nor
    marked invalid (curvature 1000) into a second cloud
    (cloud_classifier.h:155-162); its pipeline never consumes it
    (lidar_odometry.cpp:33 uses only `planar`), but the API exists for
    downstream users (e.g. edge-feature extensions).
    """
    R, W = curv.shape
    k = cfg.normals_window
    rows = jnp.arange(R)[:, None]
    cols = jnp.arange(W)[None, :]
    in_window = (rows >= 1) & (cols >= k) & (cols < W - k)
    return in_window & (curv < cfg.curvature_invalid_value) & ~planar_valid.reshape(R, W)
