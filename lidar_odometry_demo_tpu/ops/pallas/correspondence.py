"""Pallas TPU kernel: fused candidate-distance gate + first-min argmin.

The correspondence hot loop (reference voxel_grid.h:164-204 — brute-force
nearest stored point over 27 neighbor voxels under a distance gate) has two
phases on TPU:

1. lookup + gather: column-directory rank-select and z-triple row gathers —
   stays in XLA (Mosaic cannot vector-gather from VMEM yet; see
   DESIGN.md "Pallas status"),
2. reduce: per query, the masked min over 27*K candidate distances and the
   select of the winning point + its (voxel, k) index.

Phase 2 is what this kernel fuses: XLA materializes the (Q, 27*K) distance
array plus argmin/take_along_axis intermediates in HBM; the kernel streams
candidate tiles through VMEM and writes only (Q, 3+1+1). It runs once per
ICP outer iteration against the per-scan candidate cache
(ops/voxel_map.py CandidateSet), wired behind config.icp_use_pallas.

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


def _reduce_kernel(qw_ref, cand_ref, ok_ref, out_o_ref, out_i_ref, out_d_ref,
                   *, n_cand: int, max_d2: float):
    """One grid step handles a tile of queries.

    qw_ref:   (T, 3)            query world positions
    cand_ref: (T, n_cand, 3)    candidate points
    ok_ref:   (T, n_cand)       candidate validity (float32 0/1)
    out_o_ref:(T, 3)            winning candidate point
    out_i_ref:(T, 1) int32      winning flat candidate index (first min)
    out_d_ref:(T, 1)            winning gated squared distance
    """
    qw = qw_ref[:]                       # (T, 3)
    cand = cand_ref[:]                   # (T, C, 3)
    ok = ok_ref[:]                       # (T, C)

    diff = cand - qw[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)   # (T, C)
    gated = jnp.where((ok > 0.5) & (d2 < max_d2), d2, max_d2)

    best_d = jnp.min(gated, axis=-1, keepdims=True)          # (T, 1)
    # first minimum in candidate order (matches reference scan order)
    is_best = gated <= best_d                                  # (T, C)
    cidx = jax.lax.broadcasted_iota(jnp.int32, gated.shape, 1)
    first = jnp.min(jnp.where(is_best, cidx, n_cand - 1), axis=-1, keepdims=True)
    pick = cidx == first                                       # (T, C) one-hot

    out_o_ref[:] = jnp.sum(cand * pick[..., None], axis=1)
    out_i_ref[:] = first
    out_d_ref[:] = best_d


@functools.partial(jax.jit, static_argnames=("max_d2", "tile", "interpret"))
def reduce_candidates(q_world, cand_pts, cand_ok, *, max_d2: float,
                      tile: int = 256, interpret: bool = False):
    """(plane_origin (Q,3), first_idx (Q,) int32, best_d2 (Q,)).

    q_world (Q,3); cand_pts (Q, C, 3); cand_ok (Q, C) bool.
    """
    Q, C = cand_ok.shape
    assert Q % tile == 0, (Q, tile)
    kern = functools.partial(_reduce_kernel, n_cand=C, max_d2=float(max_d2))
    out_o, out_i, out_d = pl.pallas_call(
        kern,
        grid=(Q // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
    )(q_world, cand_pts, cand_ok.astype(jnp.float32))
    return out_o, out_i[:, 0], out_d[:, 0]
