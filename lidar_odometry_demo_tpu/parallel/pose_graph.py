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
