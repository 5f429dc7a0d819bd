"""Pose-graph refinement: drift correction, Schur == direct, sharded edges."""

import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import PartitionSpec as P

from lidar_odometry_demo_tpu.ops import se3
from lidar_odometry_demo_tpu.parallel import mesh as mesh_lib
from lidar_odometry_demo_tpu.parallel import pose_graph as pg
from scipy.spatial.transform import Rotation


def _make_noisy_loop(P_n=32, drift=0.03, seed=0):
    """Ground truth: a circle returning to start. Odometry poses accumulate
    noise; a loop closure ties last to first."""
    rng = np.random.default_rng(seed)
    # ground truth poses around a circle
    angles = np.linspace(0, 2 * np.pi, P_n, endpoint=False)
    radius = 10.0
    gt_t = np.stack([radius * np.cos(angles), radius * np.sin(angles), np.zeros(P_n)], -1)
    gt_q = []
    for a in angles:
        q = Rotation.from_euler("z", a + np.pi / 2).as_quat()
        gt_q.append([q[3], q[0], q[1], q[2]])
    gt_q = np.asarray(gt_q)

    # odometry = gt relative transforms + noise, integrated
    est_t = [gt_t[0]]
    est_q = [gt_q[0]]
    for k in range(P_n - 1):
        a = se3.Pose(jnp.asarray(gt_t[k], jnp.float32), jnp.asarray(gt_q[k], jnp.float32))
        b = se3.Pose(jnp.asarray(gt_t[k + 1], jnp.float32), jnp.asarray(gt_q[k + 1], jnp.float32))
        z = se3.relative_to(a, b)
        noise_t = rng.normal(0, drift, 3).astype(np.float32)
        noise_w = rng.normal(0, drift * 0.3, 3).astype(np.float32)
        z_noisy = se3.Pose(z.t + noise_t, se3.quat_mul(se3.quat_exp(jnp.asarray(noise_w)), z.q))
        cur = se3.Pose(jnp.asarray(est_t[-1]), jnp.asarray(est_q[-1]))
        nxt = se3.compose(cur, z_noisy)
        est_t.append(np.asarray(nxt.t))
        est_q.append(np.asarray(nxt.q))
    est_t, est_q = np.asarray(est_t), np.asarray(est_q)

    # loop closure: measured true relative pose between last and first
    a = se3.Pose(jnp.asarray(gt_t[-1], jnp.float32), jnp.asarray(gt_q[-1], jnp.float32))
    b = se3.Pose(jnp.asarray(gt_t[0], jnp.float32), jnp.asarray(gt_q[0], jnp.float32))
    z_loop = se3.relative_to(a, b)
    return gt_t, gt_q, est_t, est_q, z_loop


def test_loop_closure_reduces_drift():
    gt_t, gt_q, est_t, est_q, z_loop = _make_noisy_loop()
    g = pg.chain_from_odometry(est_t, est_q, closures=[(len(est_t) - 1, 0, z_loop, 1.0)])
    before = np.sqrt(np.mean(np.sum((est_t - gt_t) ** 2, -1)))
    refined = pg.refine(g, iterations=10)
    after_t = np.asarray(refined.poses.t)
    after = np.sqrt(np.mean(np.sum((after_t - gt_t) ** 2, -1)))
    assert after < 0.5 * before, (before, after)
    # anchored: pose 0 stays
    np.testing.assert_allclose(after_t[0], est_t[0], atol=1e-3)


def test_schur_matches_direct():
    gt_t, gt_q, est_t, est_q, z_loop = _make_noisy_loop(P_n=16)
    g = pg.chain_from_odometry(est_t, est_q, closures=[(15, 0, z_loop, 1.0)])
    H, b = pg.build_normal_equations(g)
    dx_direct = np.asarray(pg.solve_direct(H, b, damping=0.0))
    is_sep = jnp.arange(16) % 4 == 0
    dx_schur = np.asarray(pg.solve_schur(H, b, is_sep, damping=0.0))
    # f32 dense elimination: compare to a few parts in 1e3 of the step scale
    scale = np.abs(dx_direct).max()
    np.testing.assert_allclose(dx_schur, dx_direct, atol=5e-3 * scale)


def test_perfect_odometry_is_fixed_point():
    gt_t, gt_q, _, _, _ = _make_noisy_loop(drift=0.0)
    g = pg.chain_from_odometry(gt_t, gt_q)
    refined = pg.refine(g, iterations=3)
    np.testing.assert_allclose(np.asarray(refined.poses.t), gt_t, atol=1e-3)


def _closure(gt_t, gt_q, i, j):
    a = se3.Pose(jnp.asarray(gt_t[i], jnp.float32), jnp.asarray(gt_q[i], jnp.float32))
    b = se3.Pose(jnp.asarray(gt_t[j], jnp.float32), jnp.asarray(gt_q[j], jnp.float32))
    return se3.relative_to(a, b)


def test_segment_schur_matches_direct():
    """Block-sparse segment elimination == dense direct solve on a chain
    with separator-aligned closures (stride 8; closures at 0/8/16/24)."""
    gt_t, gt_q, est_t, est_q, _ = _make_noisy_loop(P_n=32)
    closures = [
        (24, 0, _closure(gt_t, gt_q, 24, 0), 1.0),
        (16, 8, _closure(gt_t, gt_q, 16, 8), 1.0),
    ]
    g = pg.chain_from_odometry(est_t, est_q, closures=closures)

    H, b = pg.build_normal_equations(g)
    dx_direct = np.asarray(pg.solve_direct(H, b, damping=0.0))

    diag, off, S_extra, bb = pg.build_chain_system(g, stride=8)
    np.testing.assert_allclose(np.asarray(bb), np.asarray(b), atol=1e-5)
    dx_seg = np.asarray(pg.solve_segment_schur(diag, off, S_extra, bb,
                                               stride=8, damping=0.0))
    scale = np.abs(dx_direct).max()
    np.testing.assert_allclose(dx_seg, dx_direct, atol=5e-3 * scale)


def test_refine_segment_scales_past_64_poses():
    """The segment solver handles P=256 (dense (6P)^3 would be 3.6e9 flops
    per iteration and O(P^2) memory for H alone) and converges: the
    loop-closed refinement cuts the accumulated drift."""
    P_n, stride = 256, 8
    gt_t, gt_q, est_t, est_q, _ = _make_noisy_loop(P_n=P_n, drift=0.02)
    closures = [(248, 0, _closure(gt_t, gt_q, 248, 0), 1.0),
                (128, 0, _closure(gt_t, gt_q, 128, 0), 1.0)]
    g = pg.chain_from_odometry(est_t, est_q, closures=closures)

    before = np.sqrt(np.mean(np.sum((est_t - gt_t) ** 2, -1)))
    refined = jax.jit(
        lambda gg: pg.refine_segment(gg, stride=stride, iterations=10)
    )(g)
    after_t = np.asarray(refined.poses.t)
    after = np.sqrt(np.mean(np.sum((after_t - gt_t) ** 2, -1)))
    assert after < 0.5 * before, (before, after)
    np.testing.assert_allclose(after_t[0], est_t[0], atol=1e-3)


def test_refine_sharded_matches_single_device():
    """The shard_map edge-sharded refinement driver produces the same
    refined trajectory as the single-device refine."""
    gt_t, gt_q, est_t, est_q, z_loop = _make_noisy_loop(P_n=32)
    g = pg.chain_from_odometry(est_t, est_q, closures=[(31, 0, z_loop, 1.0)])
    g8 = pg.pad_edges(g, 8)

    mesh = mesh_lib.make_mesh(dp=8, sp=1)
    run = pg.make_refine_sharded(mesh, axis="dp", iterations=5)
    refined_sh = run(g8)
    refined = pg.refine(g, iterations=5)
    np.testing.assert_allclose(
        np.asarray(refined_sh.poses.t), np.asarray(refined.poses.t), atol=2e-3)


def test_edge_sharded_normal_equations_match():
    """Edges sharded over 8 devices + psum == single-device assembly."""
    gt_t, gt_q, est_t, est_q, z_loop = _make_noisy_loop(P_n=33)  # 32 edges + closure
    g = pg.chain_from_odometry(est_t, est_q, closures=[(32, 0, z_loop, 1.0)])
    # pad edges to a multiple of 8 with invalid edges
    E = int(g.edge_i.shape[0])
    pad = (-E) % 8
    gp = g._replace(
        edge_i=jnp.concatenate([g.edge_i, jnp.zeros(pad, jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.ones(pad, jnp.int32)]),
        edge_z=se3.Pose(
            jnp.concatenate([g.edge_z.t, jnp.zeros((pad, 3), jnp.float32)]),
            jnp.concatenate([g.edge_z.q, jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (pad, 1))]),
        ),
        edge_w_rot=jnp.concatenate([g.edge_w_rot, jnp.zeros(pad, jnp.float32)]),
        edge_w_t=jnp.concatenate([g.edge_w_t, jnp.zeros(pad, jnp.float32)]),
        edge_valid=jnp.concatenate([g.edge_valid, jnp.zeros(pad, bool)]),
    )
    H_ref, b_ref = pg.build_normal_equations(gp)

    mesh = mesh_lib.make_mesh(dp=8, sp=1)

    def shard_fn(poses_t, poses_q, ei, ej, zt, zq, wr, wt, valid):
        gg = pg.PoseGraph(
            poses=se3.Pose(poses_t, poses_q),
            edge_i=ei, edge_j=ej, edge_z=se3.Pose(zt, zq),
            edge_w_rot=wr, edge_w_t=wt, edge_valid=valid,
        )
        # psum happens before the gauge prior, which each device then adds
        # once to its replicated copy — matching single-device assembly
        return pg.build_normal_equations(gg, axis_name="dp")

    f = jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    H_sh, b_sh = f(
        gp.poses.t, gp.poses.q, gp.edge_i, gp.edge_j,
        gp.edge_z.t, gp.edge_z.q, gp.edge_w_rot, gp.edge_w_t, gp.edge_valid,
    )
    # f32 psum reassociation vs sequential adds: small absolute slack
    np.testing.assert_allclose(np.asarray(b_sh), np.asarray(b_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(H_sh), np.asarray(H_ref), atol=1e-2)
