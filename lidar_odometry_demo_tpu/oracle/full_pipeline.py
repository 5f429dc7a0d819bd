"""Complete NumPy odometry pipeline — an independent implementation of the
reference's processCloud semantics (reference src/lidar_odometry.cpp:22-77)
built on the dict/loop primitives in reference_semantics.py.

Used as a redundancy check: the static-shape JAX engine and this dynamic
NumPy engine share no code on the hot path, so trajectory agreement between
them on the same input is strong evidence both implement the documented
semantics (the reference itself cannot run here — no ROS/PCL/Ceres).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

from lidar_odometry_demo_tpu.config import OdometryConfig
from lidar_odometry_demo_tpu.oracle.reference_semantics import (
    DictVoxelGrid,
    classify_oracle,
    deskew_oracle,
)


class _Pose:
    def __init__(self, t=None, R=None):
        self.t = np.zeros(3) if t is None else np.asarray(t, np.float64)
        self.R = Rotation.identity() if R is None else R

    def compose(self, o):
        return _Pose(self.t + self.R.apply(o.t), self.R * o.R)

    def inverse(self):
        Ri = self.R.inv()
        return _Pose(Ri.apply(-self.t), Ri)

    def relative_to(self, o):
        return self.inverse().compose(o)

    def quat_wxyz(self):
        q = self.R.as_quat()
        return np.array([q[3], q[0], q[1], q[2]])


def _icp_align(keyframe: DictVoxelGrid, cloud: np.ndarray, guess: _Pose,
               cfg: OdometryConfig) -> _Pose:
    """CloudMatcher::align semantics (cloud_matcher.cpp:105-178) with the
    same GN formulation as the JAX engine (delta on SE(3))."""
    pose = _Pose(guess.t.copy(), guess.R)
    max_d2 = cfg.icp_max_correspondence_distance ** 2
    prior_w = (1.0 / cfg.icp_translation_prior_sigma) ** 2
    last_step = np.inf
    best_cost, best_pose, stall = np.inf, pose, 0
    for outer in range(cfg.icp_max_outer_iterations):
        # correspondences at current pose
        Rm = pose.R.as_matrix()
        src, orig, nrm = [], [], []
        for p in cloud:
            q = Rm @ p + pose.t
            match = keyframe.get_correspondence(q.astype(np.float32), max_d2)
            if match is not None:
                src.append(p)
                orig.append(match[0])
                nrm.append(match[1])
        if not src:
            break
        src = np.asarray(src, np.float64)
        orig = np.asarray(orig, np.float64)
        nrm = np.asarray(nrm, np.float64)

        # stall exit on the best robust mean cost (mirrors ops/icp.py)
        pw = src @ Rm.T + pose.t
        r = np.sum((pw - orig) * nrm, axis=1)
        absr = np.abs(r)
        hub = np.where(absr <= cfg.icp_huber_delta, 0.5 * r * r,
                       cfg.icp_huber_delta * (absr - 0.5 * cfg.icp_huber_delta))
        cost = hub.sum() / max(len(src), 1)
        if cost < best_cost * (1.0 - cfg.icp_stall_rel_tolerance):
            best_cost, best_pose, stall = cost, _Pose(pose.t.copy(), pose.R), 0
        else:
            stall += 1
            if stall >= cfg.icp_stall_exit_rounds:
                return best_pose if cfg.icp_best_pose_exit else pose

        for _ in range(cfg.icp_inner_iterations):
            Rm = pose.R.as_matrix()
            pw = src @ Rm.T + pose.t
            r = np.sum((pw - orig) * nrm, axis=1)
            absr = np.abs(r)
            w = np.where(absr <= cfg.icp_huber_delta, 1.0,
                         cfg.icp_huber_delta / np.maximum(absr, 1e-30))
            rp = src @ Rm.T
            J = np.concatenate([np.cross(rp, nrm), nrm], axis=1)  # (N, 6)
            Jw = J * w[:, None]
            H = J.T @ Jw
            b = Jw.T @ r
            H[3:, 3:] += prior_w * np.eye(3)
            b[3:] += prior_w * (pose.t - guess.t)
            H += cfg.icp_damping * np.diag(np.diag(H)) + 1e-9 * np.eye(6)
            delta = -np.linalg.solve(H, b)
            pose = _Pose(pose.t + delta[3:],
                         Rotation.from_rotvec(delta[:3]) * pose.R)
            last_step = np.linalg.norm(delta)
        if last_step < cfg.icp_convergence_step_norm and outer > cfg.icp_min_outer_iterations - 1:
            break
    # converged: keep the final pose (reference behavior). Iteration-cap
    # exit without convergence: return the best-cost pose (mirrors ops/icp.py)
    # unless icp_best_pose_exit is off — the reference keeps the final
    # round's pose at the cap (cloud_matcher.cpp:175-177).
    if last_step < cfg.icp_convergence_step_norm or not cfg.icp_best_pose_exit:
        return pose
    return best_pose if best_cost < np.inf else pose


class OracleOdometry:
    """processCloud loop (lidar_odometry.cpp:22-77), NumPy edition."""

    def __init__(self, cfg: OdometryConfig):
        self.cfg = cfg
        self.keyframe = DictVoxelGrid(cfg.keyframe_voxel_size, cfg.keyframe_max_points_cnt)
        self.current = _Pose()
        self.previous = _Pose()

    def process(self, xyz, ring, time):
        cfg = self.cfg
        # 1. time normalize
        t = np.asarray(time, np.float64)
        rng = t.max() - t.min()
        tn = (t - t.min()) / (rng if rng > 0 else 1.0)
        # 2. constant velocity + deskew
        relative = self.previous.relative_to(self.current)
        self.previous = self.current
        rel_inv = relative.inverse()
        q0 = rel_inv.quat_wxyz()
        xyz_d = deskew_oracle(xyz, tn, rel_inv.t, q0, np.zeros(3), [1, 0, 0, 0],
                              forward_translation=cfg.deskew_forward_translation)
        # 3. classify
        planar_mask, normals, img, curv = classify_oracle(
            xyz_d, ring, cfg.num_rings, cfg.scan_width,
            cfg.curvature_window, cfg.normals_window, cfg.flatness_threshold,
            cfg.min_valid_range_sq, cfg.curvature_invalid_value,
            cfg.neighbor_flatness_factor,
        )
        pts = img[planar_mask]
        nrms = normals[planar_mask]
        # 4. range filter
        d2 = np.sum(pts ** 2, axis=1)
        keep = (d2 >= cfg.lidar_min_range ** 2) & (d2 <= cfg.lidar_max_range ** 2)
        pts, nrms = pts[keep], nrms[keep]
        # 5. downsample grids
        upd = DictVoxelGrid(cfg.keyframe_update_voxel_size, 1)
        upd.add_cloud(pts, nrms)
        upd_pts, upd_nrms = upd.get_cloud()
        if self.keyframe.size() == 0:
            self.keyframe.add_cloud(upd_pts, upd_nrms)
            return
        match = DictVoxelGrid(cfg.keyframe_matching_voxel_size, 1)
        match.add_cloud(pts, nrms)
        match_pts, _ = match.get_cloud()
        # 6. ICP
        guess = self.current.compose(relative)
        new_pose = _icp_align(self.keyframe, match_pts.astype(np.float64), guess, cfg)
        # 7. divergence guard
        delta_R = new_pose.R * self.current.R.inv()
        ang = np.abs(np.degrees(_euler_xyz(delta_R.as_matrix())))
        thr = cfg.angular_divergence_threshold
        ok = np.all((ang < thr) | (ang > 180.0 - thr))
        if not ok:
            new_pose = guess
        self.current = new_pose
        # 8. map maintenance
        self.keyframe.radius_cleanup(self.current.t.astype(np.float32), cfg.keyframe_cleanup_range)
        Rm = self.current.R.as_matrix()
        world_pts = upd_pts @ Rm.T + self.current.t
        world_nrms = upd_nrms @ Rm.T
        self.keyframe.add_cloud(world_pts.astype(np.float32), world_nrms.astype(np.float32))


def _euler_xyz(R):
    """Eigen eulerAngles(0,1,2) (same transcription as ops/se3.py)."""
    res0_raw = np.arctan2(R[1, 2], R[2, 2])
    c2 = np.hypot(R[0, 0], R[0, 1])
    flip = res0_raw > 0
    res0 = res0_raw - np.pi if flip else res0_raw
    res1 = np.arctan2(-R[0, 2], -c2 if flip else c2)
    s1, c1 = np.sin(res0), np.cos(res0)
    res2 = np.arctan2(s1 * R[2, 0] - c1 * R[1, 0], c1 * R[1, 1] - s1 * R[2, 1])
    return -np.array([res0, res1, res2])
