"""Pose-graph refinement: batched GN over keyframe poses with a
Schur-complement elimination solver, edge-sharded across the device mesh.

A *new* capability beyond reference parity (the reference is pure
scan-to-map odometry with no global refinement; BASELINE.json's north star
adds "multi-keyframe pose-graph refinement via Schur-complement elimination
... over psum/all-gather collectives", configs 5). Design:

- nodes: keyframe poses X_i in SE(3) (Pose pytree, (P,) batch),
- edges: relative-pose constraints Z_ij (odometry chain + loop closures),
  residual r_ij = [Log_SO3(R_z^T R_i^T R_j), R_z^T(R_i^T(t_j - t_i) - t_z)]
- per-edge 6x6 Jacobian blocks via forward-mode autodiff (vmapped — tiny,
  exact, and TPU-friendly), assembled into the dense block normal
  equations; gauge fixed by a strong prior on pose 0,
- solve either directly (Cholesky) or by two-level Schur elimination:
  interior poses are eliminated per segment and the reduced separator
  system is solved globally — the distributed pattern shards segments
  across devices and psums the separator system (one collective per GN
  iteration), mirroring how HBA/bundle-adjustment distribute over blocks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_odometry_demo_tpu.ops import se3


class PoseGraph(NamedTuple):
    poses: se3.Pose        # (P,) node estimates
    edge_i: jax.Array      # (E,) int32 source node
    edge_j: jax.Array      # (E,) int32 target node
    edge_z: se3.Pose       # (E,) measured relative pose (i -> j)
    edge_w_rot: jax.Array  # (E,) rotation information weight
    edge_w_t: jax.Array    # (E,) translation information weight
    edge_valid: jax.Array  # (E,) mask


def edge_residual(xi_i, xi_j, pose_i: se3.Pose, pose_j: se3.Pose, z: se3.Pose):
    """6-dim residual of one edge at local perturbations (xi_i, xi_j).

    Left-multiplicative: X <- (exp(w), dt) ∘ X with w = xi[:3], dt = xi[3:].
    """
    pi = se3.apply_delta(pose_i, xi_i)
    pj = se3.apply_delta(pose_j, xi_j)
    rel = se3.relative_to(pi, pj)        # X_i^-1 X_j
    err = se3.relative_to(z, rel)        # Z^-1 (X_i^-1 X_j)
    return jnp.concatenate([se3.quat_log(err.q), err.t])


def _edge_system(pose_i, pose_j, z, w_rot, w_t):
    """(J_i, J_j, r) for one edge, Jacobians by forward-mode autodiff."""
    zero = jnp.zeros(6, jnp.float32)
    r = edge_residual(zero, zero, pose_i, pose_j, z)
    J_i = jax.jacfwd(lambda xi: edge_residual(xi, zero, pose_i, pose_j, z))(zero)
    J_j = jax.jacfwd(lambda xj: edge_residual(zero, xj, pose_i, pose_j, z))(zero)
    w = jnp.concatenate([jnp.full(3, w_rot), jnp.full(3, w_t)])
    return J_i * w[:, None] ** 0.5, J_j * w[:, None] ** 0.5, r * w ** 0.5


def build_normal_equations(g: PoseGraph, axis_name: str | None = None):
    """Dense block normal equations H (6P, 6P), b (6P,) from all edges.

    With `axis_name`, the edge arrays are assumed sharded along that mesh
    axis and H/b are psum-reduced — the edge-parallel distributed pattern.
    """
    P = g.poses.t.shape[0]

    def per_edge(i, j, zt, zq, wr, wt, valid):
        pi = se3.Pose(g.poses.t[i], g.poses.q[i])
        pj = se3.Pose(g.poses.t[j], g.poses.q[j])
        J_i, J_j, r = _edge_system(pi, pj, se3.Pose(zt, zq), wr, wt)
        m = jnp.where(valid, 1.0, 0.0)
        return J_i * m, J_j * m, r * m

    J_i, J_j, r = jax.vmap(per_edge)(
        g.edge_i, g.edge_j, g.edge_z.t, g.edge_z.q,
        g.edge_w_rot, g.edge_w_t, g.edge_valid,
    )  # (E, 6, 6), (E, 6, 6), (E, 6)

    H = jnp.zeros((P, P, 6, 6), jnp.float32)
    b = jnp.zeros((P, 6), jnp.float32)

    Hii = jnp.einsum("eab,eac->ebc", J_i, J_i)
    Hjj = jnp.einsum("eab,eac->ebc", J_j, J_j)
    Hij = jnp.einsum("eab,eac->ebc", J_i, J_j)
    bi = jnp.einsum("eab,ea->eb", J_i, r)
    bj = jnp.einsum("eab,ea->eb", J_j, r)

    H = H.at[g.edge_i, g.edge_i].add(Hii)
    H = H.at[g.edge_j, g.edge_j].add(Hjj)
    H = H.at[g.edge_i, g.edge_j].add(Hij)
    H = H.at[g.edge_j, g.edge_i].add(jnp.swapaxes(Hij, -1, -2))
    b = b.at[g.edge_i].add(bi)
    b = b.at[g.edge_j].add(bj)

    if axis_name is not None:
        H = jax.lax.psum(H, axis_name)
        b = jax.lax.psum(b, axis_name)

    # gauge prior: pin pose 0
    H = H.at[0, 0].add(1e6 * jnp.eye(6, dtype=jnp.float32))
    return H, b


def _dense(H):
    P = H.shape[0]
    return jnp.transpose(H, (0, 2, 1, 3)).reshape(P * 6, P * 6)


def solve_direct(H, b, damping: float = 1e-6):
    P = b.shape[0]
    Hd = _dense(H)
    Hd = Hd + damping * jnp.diag(jnp.diag(Hd)) + 1e-8 * jnp.eye(P * 6)
    delta = jnp.linalg.solve(Hd, -b.reshape(-1))
    return delta.reshape(P, 6)


def solve_schur(H, b, is_separator: jax.Array, damping: float = 1e-6):
    """Two-level Schur elimination: eliminate interior poses, solve the
    reduced separator system, back-substitute.

    S = H_SS - H_SI H_II^-1 H_IS ;  S dx_S = -(b_S - H_SI H_II^-1 b_I)
    dx_I = -H_II^-1 (b_I + H_IS dx_S)

    Static-shape trick: instead of slicing dynamic index sets, zero the
    cross blocks with masks and use the full-size matrices — the interior
    and separator systems stay (6P, 6P) but decouple exactly, which keeps
    this jittable and shardable (each device eliminates its interior block;
    the separator psum happens in the sharded driver).
    """
    P = b.shape[0]
    sep = is_separator.astype(jnp.float32)
    interior = 1.0 - sep
    diag = jnp.arange(P)

    mask_ii = interior[:, None] * interior[None, :]
    mask_ss = sep[:, None] * sep[None, :]
    mask_si = sep[:, None] * interior[None, :]
    mask_is = interior[:, None] * sep[None, :]

    # interior-interior blocks; identity on separator diagonal positions so
    # the dense inverse stays well-defined (and exactly decoupled)
    H_ii = H * mask_ii[:, :, None, None]
    H_ii = H_ii.at[diag, diag].add(sep[:, None, None] * jnp.eye(6, dtype=H.dtype))

    b_i = (b * interior[:, None]).reshape(-1)
    b_s = (b * sep[:, None]).reshape(-1)

    Hii_d = _dense(H_ii) + 1e-8 * jnp.eye(P * 6)
    Hsi_d = _dense(H * mask_si[:, :, None, None])
    His_d = _dense(H * mask_is[:, :, None, None])

    Hii_inv_bi = jnp.linalg.solve(Hii_d, b_i)
    Hii_inv_His = jnp.linalg.solve(Hii_d, His_d)

    S = _dense(H * mask_ss[:, :, None, None]) - Hsi_d @ Hii_inv_His
    rhs = b_s - Hsi_d @ Hii_inv_bi
    sep6 = jnp.repeat(sep, 6)
    S = S + jnp.diag(1.0 - sep6) + damping * jnp.diag(jnp.diag(S)) + 1e-8 * jnp.eye(P * 6)
    dx_s = jnp.linalg.solve(S, -rhs) * sep6

    dx_i = jnp.linalg.solve(Hii_d, -(b_i + His_d @ dx_s)) * jnp.repeat(interior, 6)
    return (dx_s + dx_i).reshape(P, 6)


# ---------------------------------------------------------------------------
# Block-sparse segment Schur: O(P * 6^3) instead of dense O((6P)^3)
# ---------------------------------------------------------------------------

def build_chain_system(g: PoseGraph, stride: int, axis_name: str | None = None):
    """Block-sparse normal equations for a chain + separator-aligned
    closures.

    Returns (diag (P,6,6), off (P,6,6) [off[i] = H[i, i+1], off[P-1] unused],
    S_extra (n_sep+1, n_sep+1, 6, 6) closure cross-blocks in separator
    coordinates, b (P,6)). Requires every non-chain edge to join two
    separator poses (indices divisible by `stride`) — the classic cut-vertex
    alignment that keeps each interior segment exactly block-tridiagonal.
    With axis_name set, edges are sharded and all outputs psum-reduced.
    """
    P = g.poses.t.shape[0]
    n_sep = P // stride

    def per_edge(i, j, zt, zq, wr, wt, valid):
        pi = se3.Pose(g.poses.t[i], g.poses.q[i])
        pj = se3.Pose(g.poses.t[j], g.poses.q[j])
        J_i, J_j, r = _edge_system(pi, pj, se3.Pose(zt, zq), wr, wt)
        m = jnp.where(valid, 1.0, 0.0)
        return J_i * m, J_j * m, r * m

    J_i, J_j, r = jax.vmap(per_edge)(
        g.edge_i, g.edge_j, g.edge_z.t, g.edge_z.q,
        g.edge_w_rot, g.edge_w_t, g.edge_valid,
    )
    Hii = jnp.einsum("eab,eac->ebc", J_i, J_i)
    Hjj = jnp.einsum("eab,eac->ebc", J_j, J_j)
    Hij = jnp.einsum("eab,eac->ebc", J_i, J_j)
    bi = jnp.einsum("eab,ea->eb", J_i, r)
    bj = jnp.einsum("eab,ea->eb", J_j, r)

    diag = jnp.zeros((P, 6, 6), jnp.float32)
    diag = diag.at[g.edge_i].add(Hii)
    diag = diag.at[g.edge_j].add(Hjj)
    b = jnp.zeros((P, 6), jnp.float32)
    b = b.at[g.edge_i].add(bi)
    b = b.at[g.edge_j].add(bj)

    is_chain = g.edge_j == g.edge_i + 1
    off = jnp.zeros((P, 6, 6), jnp.float32)
    off = off.at[jnp.where(is_chain, g.edge_i, P)].add(Hij, mode="drop")

    # closure cross-blocks land directly in the separator system
    S_extra = jnp.zeros((n_sep + 1, n_sep + 1, 6, 6), jnp.float32)
    ci = g.edge_i // stride
    cj = g.edge_j // stride
    drop = is_chain | ~g.edge_valid
    ci = jnp.where(drop, n_sep, ci)  # virtual row absorbs chain edges
    cj = jnp.where(drop, n_sep, cj)
    S_extra = S_extra.at[ci, cj].add(Hij, mode="drop")
    S_extra = S_extra.at[cj, ci].add(jnp.swapaxes(Hij, -1, -2), mode="drop")
    S_extra = S_extra.at[n_sep, n_sep].set(0.0)

    if axis_name is not None:
        diag = jax.lax.psum(diag, axis_name)
        off = jax.lax.psum(off, axis_name)
        S_extra = jax.lax.psum(S_extra, axis_name)
        b = jax.lax.psum(b, axis_name)
    return diag, off, S_extra, b


def _tridiag_solve(D, O, RHS):
    """Block-tridiagonal solve (block Thomas) for one segment.

    D (L,6,6) diagonal blocks, O (L-1,6,6) with O[i] = H[i, i+1],
    RHS (L,6,K). Returns X (L,6,K) with H X = RHS.
    """
    def fwd(carry, inp):
        G_prev, V_prev = carry
        D_i, O_prev, O_i, R_i = inp
        # forward elimination: M_i = D_i - O_{i-1}^T M_{i-1}^-1 O_{i-1}
        # (O_prev is zero-padded for the first row, so no branch needed)
        M_i = D_i - jnp.swapaxes(O_prev, 0, 1) @ G_prev
        W_i = R_i - jnp.swapaxes(O_prev, 0, 1) @ V_prev
        G_i = jnp.linalg.solve(M_i, O_i)   # for the next row + back-sub
        V_i = jnp.linalg.solve(M_i, W_i)
        return (G_i, V_i), (G_i, V_i)

    # pad O on both ends so row i sees (O_{i-1}, O_i); O_{-1} = O_{L-1} = 0
    O_pad = jnp.concatenate([jnp.zeros((1, 6, 6)), O, jnp.zeros((1, 6, 6))])
    inputs = (D, O_pad[:-1], O_pad[1:], RHS)
    _, (G, V) = jax.lax.scan(
        fwd, (jnp.zeros((6, 6)), jnp.zeros_like(RHS[0])), inputs)

    def back(X_next, inp):
        G_i, V_i = inp
        X_i = V_i - G_i @ X_next
        return X_i, X_i

    _, X = jax.lax.scan(back, jnp.zeros_like(RHS[0]), (G, V), reverse=True)
    return X


def solve_segment_schur(diag, off, S_extra, b, stride: int,
                        damping: float = 1e-6):
    """Distributed-pattern Schur solve on the block-sparse chain system.

    Poses are split into separators (every `stride`-th, plus a virtual
    terminal) and interior segments of uniform length stride-1. Each
    segment's block-tridiagonal interior is eliminated independently
    (vmapped block Thomas — the shard/scale axis), producing 2x2 block
    contributions onto its bounding separators; the small separator system
    (closures included) is solved densely; interiors back-substitute.
    Cost O(P * 6^3) + O((P/stride * 6)^3) vs dense O((6P)^3).
    """
    P = b.shape[0]
    n_sep = P // stride
    L = stride - 1

    dmp = 1.0 + damping
    diag = diag * jnp.where(
        (jnp.eye(6, dtype=bool))[None], dmp, 1.0
    ) + 1e-7 * jnp.eye(6)[None]

    # run k: interiors k*stride+1 .. k*stride+stride-1
    D_runs = diag.reshape(n_sep, stride, 6, 6)[:, 1:]
    b_runs = b.reshape(n_sep, stride, 6)[:, 1:]
    off_r = off.reshape(n_sep, stride, 6, 6)
    O_runs = off_r[:, 1:-1] if stride > 2 else jnp.zeros((n_sep, 0, 6, 6))
    A = off_r[:, 0]                      # H[s_k, s_k+1]  (left coupling)
    # H[s_{k+1}-1, s_{k+1}] — last off of run k; for the last run this is
    # off[P-1] which is zero (virtual separator)
    off_pad = jnp.concatenate([off, jnp.zeros((1, 6, 6))])
    C = off_pad.reshape(-1, 6, 6)[jnp.arange(1, n_sep + 1) * stride - 1]

    # RHS per run: [b_I (1 col) | E_L = A^T at row 0 (6) | E_R = C at row L-1 (6)]
    E_L = jnp.zeros((n_sep, L, 6, 6)).at[:, 0].set(jnp.swapaxes(A, -1, -2))
    E_R = jnp.zeros((n_sep, L, 6, 6)).at[:, L - 1].set(C)
    RHS = jnp.concatenate([b_runs[..., None], E_L, E_R], axis=-1)  # (n,L,6,13)

    X = jax.vmap(_tridiag_solve)(D_runs, O_runs, RHS)  # (n,L,6,13)
    u_b = X[..., 0]          # (n, L, 6)
    X_L = X[..., 1:7]        # (n, L, 6, 6)
    X_R = X[..., 7:13]

    # separator system S (n_sep+1 blocks): S = H_SS - H_SI U H_IS
    sep_idx = jnp.arange(n_sep) * stride
    S = jnp.zeros((n_sep + 1, n_sep + 1, 6, 6))
    S = S.at[jnp.arange(n_sep), jnp.arange(n_sep)].set(diag[sep_idx])
    S = S.at[n_sep, n_sep].set(jnp.eye(6))
    S = S + S_extra

    AX_L = jnp.einsum("kab,kbc->kac", A, X_L[:, 0])      # A_k U[0] A_k^T cols
    AX_R = jnp.einsum("kab,kbc->kac", A, X_R[:, 0])
    CX_L = jnp.einsum("kba,kbc->kac", C, X_L[:, L - 1])  # C^T U[L-1] ...
    CX_R = jnp.einsum("kba,kbc->kac", C, X_R[:, L - 1])
    ks = jnp.arange(n_sep)
    S = S.at[ks, ks].add(-AX_L)
    S = S.at[ks, ks + 1].add(-AX_R)
    S = S.at[ks + 1, ks].add(-CX_L)
    S = S.at[ks + 1, ks + 1].add(-CX_R)

    rhs_s = jnp.zeros((n_sep + 1, 6))
    rhs_s = rhs_s.at[jnp.arange(n_sep)].set(b[sep_idx])
    rhs_s = rhs_s.at[ks].add(-jnp.einsum("kab,kb->ka", A, u_b[:, 0]))
    rhs_s = rhs_s.at[ks + 1].add(-jnp.einsum("kba,kb->ka", C, u_b[:, L - 1]))

    # gauge prior on separator 0 (pose 0)
    S = S.at[0, 0].add(1e6 * jnp.eye(6))

    Sd = jnp.transpose(S, (0, 2, 1, 3)).reshape((n_sep + 1) * 6, (n_sep + 1) * 6)
    Sd = Sd + 1e-7 * jnp.eye((n_sep + 1) * 6)
    dx_s = jnp.linalg.solve(Sd, -rhs_s.reshape(-1)).reshape(n_sep + 1, 6)

    # back-substitute interiors:
    # dx_I = -u_b - X_L dx_{s_k} - X_R dx_{s_{k+1}}
    dx_i = (
        -u_b
        - jnp.einsum("klab,kb->kla", X_L, dx_s[:n_sep])
        - jnp.einsum("klab,kb->kla", X_R, dx_s[1 : n_sep + 1])
    )
    dx = jnp.zeros((P, 6))
    dx = dx.at[sep_idx].set(dx_s[:n_sep])
    interior_idx = (sep_idx[:, None] + 1 + jnp.arange(L)[None, :]).reshape(-1)
    dx = dx.at[interior_idx].set(dx_i.reshape(-1, 6))
    return dx


def refine_segment(g: PoseGraph, stride: int = 8, iterations: int = 10,
                   axis_name: str | None = None) -> PoseGraph:
    """GN refinement via the block-sparse segment-Schur solver.

    P must be a multiple of `stride`; every loop closure must join two
    separator poses (index % stride == 0). With axis_name (inside
    shard_map), edges are sharded and the system psum-assembled.
    """
    P = g.poses.t.shape[0]
    assert P % stride == 0, (P, stride)

    def body(_, graph):
        diag, off, S_extra, b = build_chain_system(graph, stride, axis_name)
        dx = solve_segment_schur(diag, off, S_extra, b, stride)
        new_poses = jax.vmap(se3.apply_delta)(graph.poses, dx)
        return graph._replace(poses=new_poses)

    return jax.lax.fori_loop(0, iterations, body, g)


def make_refine_sharded(mesh, axis: str = "dp", iterations: int = 10,
                        use_schur: bool = False, separator_stride: int = 4):
    """Edge-sharded distributed refinement driver.

    Returns run(g) where g's edge arrays are replicated host-side; inside,
    each device takes a 1/N slice of the edges, builds its partial normal
    equations, and ONE psum per GN iteration produces the identical global
    (H, b) on every device (build_normal_equations with axis_name — the
    distributed pattern BASELINE config 5 asks for). Poses are replicated;
    the solve (dense or segment-Schur) is redundantly computed per device.
    Edge count must be padded to a multiple of the axis size (edge_valid
    masks padding).
    """
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]

    def local(poses_t, poses_q, ei, ej, zt, zq, wr, wt, valid):
        graph = PoseGraph(
            poses=se3.Pose(poses_t, poses_q),
            edge_i=ei, edge_j=ej,
            edge_z=se3.Pose(zt, zq),
            edge_w_rot=wr, edge_w_t=wt, edge_valid=valid,
        )
        Pn = poses_t.shape[0]
        is_sep = (jnp.arange(Pn) % separator_stride == 0)

        def body(_, g_):
            H, b = build_normal_equations(g_, axis_name=axis)
            if use_schur:
                dx = solve_schur(H, b, is_sep)
            else:
                dx = solve_direct(H, b)
            new_poses = jax.vmap(se3.apply_delta)(g_.poses, dx)
            return g_._replace(poses=new_poses)

        out = jax.lax.fori_loop(0, iterations, body, graph)
        return out.poses.t, out.poses.q

    @jax.jit
    def run(g: PoseGraph) -> PoseGraph:
        E = g.edge_i.shape[0]
        assert E % n == 0, f"pad edges to a multiple of {n} (got {E})"
        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        t, q = f(g.poses.t, g.poses.q, g.edge_i, g.edge_j, g.edge_z.t,
                 g.edge_z.q, g.edge_w_rot, g.edge_w_t, g.edge_valid)
        return g._replace(poses=se3.Pose(t, q))

    return run


def pad_edges(g: PoseGraph, multiple: int) -> PoseGraph:
    """Pad the edge arrays (masked invalid) to a multiple for even sharding."""
    E = g.edge_i.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return g
    zpad = lambda x, fill=0: jnp.concatenate(
        [x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)])
    return g._replace(
        edge_i=zpad(g.edge_i), edge_j=zpad(g.edge_j),
        edge_z=se3.Pose(
            zpad(g.edge_z.t),
            jnp.concatenate([g.edge_z.q,
                             jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                                      (pad, 1))])),
        edge_w_rot=zpad(g.edge_w_rot), edge_w_t=zpad(g.edge_w_t),
        edge_valid=jnp.concatenate([g.edge_valid, jnp.zeros(pad, bool)]),
    )


@partial(jax.jit, static_argnames=("iterations", "use_schur", "separator_stride"))
def refine(g: PoseGraph, iterations: int = 10, use_schur: bool = False,
           separator_stride: int = 4) -> PoseGraph:
    """Run GN iterations on the pose graph; returns the refined graph."""
    P = g.poses.t.shape[0]
    is_sep = (jnp.arange(P) % separator_stride == 0)

    def body(_, graph):
        H, b = build_normal_equations(graph)
        if use_schur:
            dx = solve_schur(H, b, is_sep)
        else:
            dx = solve_direct(H, b)
        new_poses = jax.vmap(se3.apply_delta)(graph.poses, dx)
        return graph._replace(poses=new_poses)

    return jax.lax.fori_loop(0, iterations, body, g)


def chain_from_odometry(poses_t, poses_q, closures=(), w_rot: float = 100.0,
                        w_t: float = 100.0, closure_w: float = 100.0) -> PoseGraph:
    """Build a graph: consecutive odometry edges + optional loop closures.

    closures: list of (i, j, Pose z_ij, weight).
    """
    import numpy as np

    P = poses_t.shape[0]
    poses = se3.Pose(jnp.asarray(poses_t, jnp.float32), jnp.asarray(poses_q, jnp.float32))
    ei, ej, zt, zq, wr, wt = [], [], [], [], [], []
    pt = np.asarray(poses_t)
    pq = np.asarray(poses_q)
    for k in range(P - 1):
        a = se3.Pose(jnp.asarray(pt[k]), jnp.asarray(pq[k]))
        bpose = se3.Pose(jnp.asarray(pt[k + 1]), jnp.asarray(pq[k + 1]))
        z = se3.relative_to(a, bpose)
        ei.append(k); ej.append(k + 1)
        zt.append(np.asarray(z.t)); zq.append(np.asarray(z.q))
        wr.append(w_rot); wt.append(w_t)
    for (i, j, z, w) in closures:
        ei.append(i); ej.append(j)
        zt.append(np.asarray(z.t)); zq.append(np.asarray(z.q))
        wr.append(w * closure_w); wt.append(w * closure_w)
    E = len(ei)
    return PoseGraph(
        poses=poses,
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_z=se3.Pose(jnp.asarray(np.stack(zt), jnp.float32), jnp.asarray(np.stack(zq), jnp.float32)),
        edge_w_rot=jnp.asarray(wr, jnp.float32),
        edge_w_t=jnp.asarray(wt, jnp.float32),
        edge_valid=jnp.ones(E, bool),
    )
