"""Pallas TPU kernel: fused candidate-distance gate + first-min + select.

The correspondence hot loop (reference voxel_grid.h:164-204 — brute-force
nearest stored point over 27 neighbor voxels under a distance gate) has two
phases on TPU:

1. lookup + gather: column-directory rank-select and z-triple row gathers —
   stays in XLA (Mosaic cannot vector-gather arbitrary rows from HBM; see
   DESIGN.md "Pallas status"),
2. reduce: per query, the masked min over 27*K candidate distances and the
   select of the winning point + its (voxel, k) index.

Phase 2 is what this kernel fuses, streaming the RAW gathered z-triple
rows (legacy (Q, 9, 3*RW) triple-row layout, rebuilt on demand from
vm.CandidateSet.rows_z by _select_best when the flag is on; PLANAR x/y/z lanes —
see vm._lanes) through VMEM tiles and writing only (Q, 3+1+1). The XLA
formulation materializes the (Q, 27K) gated-distance array and argmin/
one-hot intermediates in HBM; the kernel keeps them in VMEM. It runs once
per ICP outer iteration against the per-scan candidate cache, wired
behind config.icp_use_pallas.

Numerically identical to the XLA path: first-minimum tie-breaking in
candidate (col, z, insertion) order, strict `d2 < max_d2` validity
(invalid candidates sit at exactly max_d2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _match_kernel(qw_ref, rows_ref, npres_ref, out_o_ref, out_i_ref,
                  out_d_ref, *, K: int, RW: int, max_d2: float):
    """One grid step handles a tile of T queries.

    STRICTLY 2-D vectors throughout: this chip's Mosaic build SIGABRTs on
    >=3-D VMEM BlockSpecs AND rejects in-kernel multi-dim shape casts
    ("infer-vector-layout: unsupported shape cast" for
    (T,1728)->(T,9,3,64)), so the 27 candidate slices are unrolled as
    lane-slice loops over the flattened rows (bisected on-chip, r4).

    qw_ref:    (T, 3) f32          query world positions
    rows_ref:  (T, 9*3*RW) i32     raw z-triple candidate rows, flattened
    npres_ref: (T, 9) i32          present voxels per triple
    out_o_ref: (T, 3) f32          winning candidate point
    out_i_ref: (T, 1) i32          winning flat (col, z, k) index (first min)
    out_d_ref: (T, 1) f32          winning gated squared distance
    """
    T = qw_ref.shape[0]
    qw = qw_ref[:]                                       # (T, 3)
    # lax.bitcast_convert_type (same-width) works in both Mosaic and
    # interpret mode; pltpu.bitcast is TPU-only
    f = jax.lax.bitcast_convert_type(rows_ref[:], jnp.float32)
    npres = npres_ref[:]
    qx = qw[:, 0:1]
    qy = qw[:, 1:2]
    qz = qw[:, 2:3]
    ki = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)

    best_d = jnp.full((T, 1), max_d2, jnp.float32)
    best_i = jnp.zeros((T, 1), jnp.int32)
    slices = []
    for c in range(9):
        for sz in range(3):
            o = (c * 3 + sz) * RW
            xs = f[:, o : o + K]
            ys = f[:, o + K : o + 2 * K]
            zs = f[:, o + 2 * K : o + 3 * K]
            cnt = f[:, o + 3 * K : o + 3 * K + 1]
            ok = (npres[:, c : c + 1] > sz) & (ki < cnt.astype(jnp.int32))
            dx = xs - qx
            dy = ys - qy
            dz = zs - qz
            d2 = dx * dx + dy * dy + dz * dz
            d2 = jnp.where(ok & (d2 < max_d2), d2, max_d2)
            mn = jnp.min(d2, axis=1, keepdims=True)
            kw = jnp.min(jnp.where(d2 <= mn, ki, K - 1), axis=1,
                         keepdims=True)
            better = mn < best_d          # strict: earlier slice wins ties
            best_i = jnp.where(better, (c * 3 + sz) * K + kw, best_i)
            best_d = jnp.minimum(best_d, mn)
            slices.append((o, xs, ys, zs))

    # winner coordinates: unrolled one-hot over the same slices
    ox = jnp.zeros((T, 1), jnp.float32)
    oy = jnp.zeros((T, 1), jnp.float32)
    oz = jnp.zeros((T, 1), jnp.float32)
    for idx, (o, xs, ys, zs) in enumerate(slices):
        pick = ki == (best_i - idx * K)   # (T, K); out-of-range -> no hit
        ox = ox + jnp.sum(jnp.where(pick, xs, 0.0), axis=1, keepdims=True)
        oy = oy + jnp.sum(jnp.where(pick, ys, 0.0), axis=1, keepdims=True)
        oz = oz + jnp.sum(jnp.where(pick, zs, 0.0), axis=1, keepdims=True)

    out_o_ref[:] = jnp.concatenate([ox, oy, oz], axis=1)
    out_i_ref[:] = best_i
    out_d_ref[:] = best_d


@functools.partial(jax.jit, static_argnames=("max_d2", "max_points", "tile",
                                             "interpret"))
def match_rows(q_world, rows, n_present, *, max_d2: float, max_points: int,
               tile: int = 256, interpret: bool = False):
    """(plane_origin (Q,3), first_idx (Q,) int32, best_d2 (Q,)).

    q_world (Q,3) f32; rows (Q, 9, 3*RW) int32 raw candidate rows with
    planar point lanes (vm._lanes); n_present (Q, 9) int32.
    """
    Q = q_world.shape[0]
    RW = rows.shape[-1] // 3
    assert Q % tile == 0, (Q, tile)
    kern = functools.partial(_match_kernel, K=max_points, RW=RW,
                             max_d2=float(max_d2))
    rows2d = rows.reshape(Q, 9 * 3 * RW)
    out_o, out_i, out_d = pl.pallas_call(
        kern,
        grid=(Q // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 9 * 3 * RW), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 9), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, 3), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.int32),
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
        ),
        interpret=interpret,
    )(q_world, rows2d, n_present)
    return out_o, out_i[:, 0], out_d[:, 0]
