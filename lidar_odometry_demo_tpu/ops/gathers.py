"""Batch-aware row gather: keeps vmapped gathers on the fast path.

Under `jax.vmap`, a plain row gather `src[idx]` lowers to an XLA BATCHED
gather whose operand gets a batch-INTERIOR layout (e.g.
`s32[8,131074,64]{2,0,1}` — the batch dim strided inside the rows) and
runs ~8x slower than the unbatched gather on this chip
(benchmarks/DEVICE_TIME_BATCHED_r05.json: the three candidate row
gathers cost 3.52 ms/lane-scan batched vs 0.40 single — the entire
batched-mode throughput regression in one lowering decision).

`take_rows` is the same gather expressed through
`jax.custom_batching.custom_vmap`: the batched rule flattens the leading
batch dim into the row dim and gathers with globalized indices — a PLAIN
2-D gather XLA lays out row-major. Unbatched behavior is identical to
`src[idx]` by construction.

STATUS (r5 chip A/B): wiring this at the pipeline's gather hotspots
REGRESSED BOTH paths (single-seq 13.0 -> 17.0 ms/scan, batched x8
aggregate 53 -> 30 scans/s): the custom_vmap primitive boundary defeats
XLA's fusion of the gathers with their surrounding streams, which costs
more than the batched-layout win. Kept as a documented negative result
and for potential standalone use; the pipeline does NOT use it. The
batched-mode account therefore stands as in
benchmarks/DEVICE_TIME_BATCHED_r05.json: vmapped lanes on ONE chip pay a
flat ~6 ms/lane-scan for XLA's batch-interior gather layouts (measured
at B=2, 4, and 8); real dp meshes run one lane per device
(parallel/batched.py) and do not inherit it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import custom_batching


@custom_batching.custom_vmap
def take_rows(src: jax.Array, idx: jax.Array) -> jax.Array:
    """`src[idx]` (row gather along axis 0; idx any shape, int32)."""
    return src[idx]


@take_rows.def_vmap
def _take_rows_vmap(axis_size, in_batched, src, idx):
    src_b, idx_b = in_batched
    B = axis_size
    if not src_b and not idx_b:
        return src[idx], False
    if not src_b:
        # shared table, per-lane indices: one flat gather over all lanes
        out = src[idx.reshape(-1)]
        return out.reshape(*idx.shape, *src.shape[1:]), True
    N = src.shape[1]
    flat = src.reshape(B * N, *src.shape[2:])
    # normalize negative indices BEFORE globalizing: src[-1] must wrap
    # within the LANE (unbatched semantics), not into lane b-1's rows
    idx = jnp.where(idx < 0, idx + N, idx)
    off = (jnp.arange(B, dtype=jnp.int32) * N)
    if idx_b:
        gidx = idx + off.reshape((B,) + (1,) * (idx.ndim - 1))
        out = flat[gidx.reshape(-1)]
        return out.reshape(*idx.shape, *src.shape[2:]), True
    gidx = idx[None] + off.reshape((B,) + (1,) * idx.ndim)
    out = flat[gidx.reshape(-1)]
    return out.reshape(B, *idx.shape, *src.shape[2:]), True
