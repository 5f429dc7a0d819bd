"""Round-5 primitive A/B: gather/scatter formulations for the search
index + candidate gather, measured on the real chip at full shapes.

The r4 device-time budget (benchmarks/DEVICE_TIME_r04.json) charges
3.23 ms/scan to candidate_gather and 1.75 ms/scan to the dense-directory
rebuild. This script measures the primitive alternatives that could cut
them, each as an i-dependent fori_loop body (loop-invariant bodies get
CSE-hoisted and lie — see scripts/kernel_chip_check.py / r4 notes):

  dense_build_full_scatter   current: C-element scatter into the 1M grid
  dense_build_compact        sort-compact leaders, scatter only U elems
  lookup_dense_elem          current: (Q*9)-element gather from 1M grid
  lookup_dblock_row          (Q)-row gather of 16-lane super-cell rows
  dblock_build_slices        building the super-cell grid from dense
  desc_row_gather            current: (Q*9)-row gather of 8-lane zmasks
  rows_gather_{C,U}          (Q*9)-row gather of 192-lane rows from the
                             full table vs a compact deduped source
  rows_gather_sorted         same gather with sorted indices (locality)
  fused_dir_row_scatter      C-row scatter of 16-lane (ptr+zmask) rows

Usage: python scripts/r05_primitives.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

C = 131072
Q = 8192
G = 1024
G2 = G * G
RW = 64
ZW = 8
U = 32768
LOOP = 50
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

rng = np.random.default_rng(0)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out)) if hasattr(out, "dtype") else float(
        sum(jnp.sum(o).astype(jnp.float32) for o in out))
    ts = []
    for _i in range(REPS):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out)) if hasattr(out, "dtype") else float(
            sum(jnp.sum(o).astype(jnp.float32) for o in out))
        ts.append(time.time() - t0)
    return min(ts)


results = {}


def report(name, t_loop, floor, per_iter_items=None):
    ms = max(t_loop - floor, 0.0) / LOOP * 1e3
    results[name] = round(ms, 4)
    extra = ""
    if per_iter_items:
        extra = f"  ({per_iter_items / (ms * 1e-3) / 1e6:.1f} M items/s)"
    log(f"{name:28s} {ms:8.4f} ms/iter{extra}")


def main():
    log(f"devices={jax.devices()}")

    tiny = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def empty(x):
        def body(i, acc):
            return acc + jnp.sum(x) * jnp.float32(i)
        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))

    floor = timed(empty, tiny)
    log(f"dispatch floor for {LOOP}-iter loop: {floor*1e3:.1f} ms")

    # ---- realistic leader structure: ~35k occupied columns over C rows
    n_lead = 35000
    lead_rows = np.sort(rng.choice(C, n_lead, replace=False)).astype(np.int32)
    leader = np.zeros(C, bool)
    leader[lead_rows] = True
    cells_np = np.sort(rng.choice(G2, n_lead, replace=False)).astype(np.int32)
    cell_of_row = np.full(C, G2, np.int32)
    cell_of_row[lead_rows] = cells_np  # ascending along rows, like the table
    leader_j = jnp.asarray(leader)
    cell_j = jnp.asarray(cell_of_row)
    iota_c = jnp.arange(C, dtype=jnp.int32)

    # ---- dense build, current formulation: C-element scatter ----
    @jax.jit
    def dense_full(cell, leader):
        def body(i, acc):
            dense = jnp.full((G2 + 1,), np.int32(0x7FFFFFFF), jnp.int32)
            tgt = jnp.where(leader, jnp.minimum(cell + i, G2 - 1),
                            G2 + 1 + iota_c)
            dense = dense.at[tgt].set(iota_c, mode="drop",
                                      unique_indices=True)
            return acc + dense[i]
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("dense_build_full_scatter", timed(dense_full, cell_j, leader_j),
           floor, C)

    # ---- dense build, compact: small sort + U-element scatter ----
    @jax.jit
    def dense_compact(cell, leader):
        def body(i, acc):
            # sort (cell-or-BIG, row) -> leaders compact at front
            key = jnp.where(leader, jnp.minimum(cell + i, G2 - 1),
                            jnp.int32(0x7FFFFFFF))
            skey, srow = jax.lax.sort((key, iota_c), num_keys=1,
                                      is_stable=True)
            ku, ru = skey[:U], srow[:U]
            ok = ku != 0x7FFFFFFF
            dense = jnp.full((G2 + 1,), np.int32(0x7FFFFFFF), jnp.int32)
            tgt = jnp.where(ok, ku, G2 + 1 + jnp.arange(U, dtype=jnp.int32))
            dense = dense.at[tgt].set(ru, mode="drop", unique_indices=True)
            return acc + dense[i]
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("dense_build_compact32k", timed(dense_compact, cell_j, leader_j),
           floor, U)

    # ---- lookups ----
    dense_np = np.full(G2 + 1, 0x7FFFFFFF, np.int32)
    dense_np[cells_np] = lead_rows
    dense_j = jnp.asarray(dense_np)
    qcells = jnp.asarray(rng.integers(0, G2, Q * 9).astype(np.int32))

    @jax.jit
    def lookup_elem(dense, qc):
        def body(i, acc):
            v = dense[jnp.minimum(qc + i, G2)]
            return acc + jnp.sum(v)
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("lookup_dense_elem_Q9", timed(lookup_elem, dense_j, qcells),
           floor, Q * 9)

    # super-cell rows: (G2/4, 16) — one row gather per query
    dblock_j = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                        (G2 // 4, 16), np.int64).astype(np.int32))
    qsc = jnp.asarray(rng.integers(0, G2 // 4, Q).astype(np.int32))

    @jax.jit
    def lookup_dblock(db, qc):
        def body(i, acc):
            v = db[jnp.minimum(qc + i, G2 // 4 - 1)]
            return acc + jnp.sum(v)
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("lookup_dblock_row_Q", timed(lookup_dblock, dblock_j, qsc),
           floor, Q)

    # wider super-cell rows: (G2/4, 128) carrying ptr+zmask for 16 columns
    dblock_w = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                        (G2 // 4, 128), np.int64).astype(np.int32))
    report("lookup_dblock128_row_Q", timed(lookup_dblock, dblock_w, qsc),
           floor, Q)

    # dblock build from a (G, G) dense grid by 16 shifted slices
    dense2d = jnp.asarray(
        rng.integers(-2**31, 2**31 - 1, (G, G), np.int64).astype(np.int32))

    @jax.jit
    def dblock_build(d2):
        def body(i, acc):
            d = d2 + i
            dp = jnp.pad(d, ((1, 2), (1, 2)))
            cols = [dp[a:a + G:2, b:b + G:2].reshape(G2 // 4, 1)
                    for a in range(4) for b in range(4)]
            db = jnp.concatenate(cols, axis=1)
            return acc + db[i, i % 16]
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("dblock_build_slices", timed(dblock_build, dense2d), floor, G2 // 4)

    # desc row gather: current (Q*9)-row gather of 8-lane rows
    desc_j = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                      (C, ZW), np.int64).astype(np.int32))
    qrows = jnp.asarray(rng.integers(0, C, Q * 9).astype(np.int32))

    @jax.jit
    def desc_gather(desc, qr):
        def body(i, acc):
            v = desc[jnp.minimum(qr + i, C - 1)]
            return acc + jnp.sum(v)
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("desc_row_gather_Q9x8", timed(desc_gather, desc_j, qrows),
           floor, Q * 9)

    # ---- the big candidate rows gather: (Q*9) x 192-lane rows ----
    rows_full = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                         (C, 3 * RW), np.int64).astype(np.int32))

    @jax.jit
    def rows_gather(rows, qr):
        n = rows.shape[0]
        def body(i, acc):
            v = rows[jnp.minimum(qr + i, n - 1)]
            return acc + jnp.sum(v[:, ::64])
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("rows_gather_full_random", timed(rows_gather, rows_full, qrows),
           floor, Q * 9)

    qrows_sorted = jnp.sort(qrows)
    report("rows_gather_full_sorted", timed(rows_gather, rows_full,
                                            qrows_sorted), floor, Q * 9)

    # realistic index pattern: 9 interleaved near-sorted streams (what the
    # candidate gather actually sees after key-ordered downsampling)
    base_sorted = np.sort(rng.integers(0, C - 200, Q)).astype(np.int32)
    offs = rng.integers(0, 200, (Q, 9)).astype(np.int32)
    qreal = jnp.asarray((base_sorted[:, None] + offs).reshape(-1))
    report("rows_gather_full_realidx", timed(rows_gather, rows_full, qreal),
           floor, Q * 9)

    rows_u = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                      (16384, 3 * RW), np.int64).astype(np.int32))
    qru = jnp.asarray(rng.integers(0, 16384, Q * 9).astype(np.int32))
    report("rows_gather_16k_random", timed(rows_gather, rows_u, qru),
           floor, Q * 9)

    rows_n = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                      (C, RW), np.int64).astype(np.int32))
    report("rows_gather_64lane_random", timed(rows_gather, rows_n, qrows),
           floor, Q * 9)

    # Q*3 gathers of 4x-wide rows (the would-be y-triple shape)
    rows_w = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                      (C, 12 * RW), np.int64).astype(np.int32))
    qr3 = jnp.asarray(rng.integers(0, C, Q * 3).astype(np.int32))
    report("rows_gather_Q3_768lane", timed(rows_gather, rows_w, qr3),
           floor, Q * 3)

    # ---- fused directory: C-row scatter of 16-lane rows into (G2, 16) ----
    vals16 = jnp.asarray(rng.integers(-2**31, 2**31 - 1,
                                      (C, 16), np.int64).astype(np.int32))

    @jax.jit
    def dir_row_scatter(cell, leader, vals):
        def body(i, acc):
            grid = jnp.zeros((G2 + 1, 16), jnp.int32)
            tgt = jnp.where(leader, jnp.minimum(cell + i, G2 - 1),
                            G2 + 1 + iota_c)
            grid = grid.at[tgt].set(vals, mode="drop", unique_indices=True)
            return acc + grid[i, 0]
        return jax.lax.fori_loop(0, LOOP, body, jnp.int32(0))

    report("dir_row_scatter_Cx16", timed(dir_row_scatter, cell_j, leader_j,
                                         vals16), floor, C)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
