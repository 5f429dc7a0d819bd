"""SE(3) / quaternion geometry core (pure jax.numpy, jit- and vmap-friendly).

Capability parity with the reference's `Pose3D` (reference src/pose_3d.h:23-57:
compose / inverse / relativeTo / rotationMatrix) plus what the TPU-native
solver needs and Ceres provided in the reference: so(3)/se(3) exp maps,
Eigen-compatible slerp (for deskew, reference src/utils/cloud_transform.h:27),
and Eigen-compatible eulerAngles(0,1,2) (for the divergence guard, reference
src/lidar_odometry.cpp:55).

Conventions: quaternions are (..., 4) arrays in (w, x, y, z) order, poses are a
`Pose` NamedTuple of translation (..., 3) and rotation quaternion (..., 4).
All functions broadcast over leading batch dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pose(NamedTuple):
    """SE(3) pose: world_point = R(q) @ local_point + t."""

    t: jax.Array  # (..., 3)
    q: jax.Array  # (..., 4) wxyz, unit

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        t = jnp.zeros((*batch_shape, 3), dtype)
        q = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype), (*batch_shape, 4)
        )
        return Pose(t, q)


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, wxyz."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the 2-cross-product form: v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    u = q[..., 1:]
    w = q[..., :1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) of unit quaternion."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def quat_from_axis_angle(axis: jax.Array, angle) -> jax.Array:
    """Unit quaternion for rotation of `angle` radians about unit `axis`."""
    angle = jnp.asarray(angle, axis.dtype)
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def quat_exp(w: jax.Array) -> jax.Array:
    """so(3) exponential: rotation vector (..., 3) -> unit quaternion.

    Safe at ||w|| -> 0 via the sinc Taylor branch.
    """
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    half = 0.5 * theta
    small = theta_sq < 1e-12
    # sin(theta/2)/theta with Taylor fallback 1/2 - theta^2/48
    k = jnp.where(
        small,
        0.5 - theta_sq / 48.0,
        jnp.sin(half) / jnp.where(small, 1.0, theta),
    )
    cw = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([cw, k * w], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector (..., 3), inverse of quat_exp."""
    w = q[..., :1]
    v = q[..., 1:]
    # force w >= 0 (shortest path)
    sign = jnp.where(w < 0, -1.0, 1.0)
    w, v = w * sign, v * sign
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-9
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / jnp.where(small, 1.0, vn))
    return v * scale


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Eigen-compatible slerp (shortest path).

    Matches Eigen Quaternion::slerp semantics used by the reference deskew
    (reference src/utils/cloud_transform.h:27): interpolates along the
    shortest great-circle arc, with a lerp fallback when the quaternions are
    nearly aligned.
    """
    t = jnp.asarray(t, q0.dtype)[..., None]
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    abs_d = jnp.abs(d)
    # Eigen: if absD >= one then scale0 = 1-t, scale1 = t (lerp)
    close = abs_d >= 1.0 - 1e-7
    theta = jnp.arccos(jnp.clip(abs_d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(close, 1.0, sin_theta)
    scale0 = jnp.where(close, 1.0 - t, jnp.sin((1.0 - t) * theta) / safe_sin)
    scale1 = jnp.where(close, t, jnp.sin(t * theta) / safe_sin)
    scale1 = jnp.where(d < 0, -scale1, scale1)
    return quat_normalize(scale0 * q0 + scale1 * q1)


# ---------------------------------------------------------------------------
# Pose algebra (reference src/pose_3d.h:23-57 semantics)
# ---------------------------------------------------------------------------

def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b: first apply b, then a (reference pose_3d.h:29-32)."""
    return Pose(a.t + quat_rotate(a.q, b.t), quat_mul(a.q, b.q))


def inverse(p: Pose) -> Pose:
    """p^-1 (reference pose_3d.h:34-39)."""
    qi = quat_conj(p.q)
    return Pose(quat_rotate(qi, -p.t), qi)


def relative_to(a: Pose, b: Pose) -> Pose:
    """a^-1 ∘ b (reference pose_3d.h:23-27 relativeTo)."""
    return compose(inverse(a), b)


def transform_points(p: Pose, pts: jax.Array) -> jax.Array:
    """Rigid transform R @ pts + t over (..., N, 3)."""
    return quat_rotate(p.q[..., None, :], pts) + p.t[..., None, :]


def se3_exp(xi: jax.Array) -> Pose:
    """se(3)-ish exponential used by the GN solver's retraction.

    xi = (omega, v): rotation vector + translation delta. We use the
    group-product retraction Pose(exp(omega), v) rather than the full
    SE(3) exp (V(omega) v); for GN steps near convergence both agree to
    first order, which is all a retraction needs. This mirrors the
    reference's quaternion-manifold + Euclidean-translation parameterization
    (reference cloud_matcher.cpp:121-132).
    """
    return Pose(xi[..., 3:], quat_exp(xi[..., :3]))


def apply_delta(p: Pose, xi: jax.Array) -> Pose:
    """Left-multiplicative solver update: (exp(w), dt) applied to p.

    R_new = exp(w) R,  t_new = t + dt.
    """
    return Pose(p.t + xi[..., 3:], quat_normalize(quat_mul(quat_exp(xi[..., :3]), p.q)))


# ---------------------------------------------------------------------------
# Eigen-compatible eulerAngles(0,1,2) — divergence guard needs exact semantics
# ---------------------------------------------------------------------------

def euler_angles_xyz(R: jax.Array) -> jax.Array:
    """Eigen `mat.eulerAngles(0,1,2)` (R = Rx(a)·Ry(b)·Rz(c), a in [0, pi]).

    Transcription of Eigen's generic EulerAngles for (i,j,k)=(0,1,2), odd=0.
    Used by the divergence guard (reference src/lidar_odometry.cpp:54-58),
    which accepts each angle being near 0 *or* near pi because this
    decomposition may return the (pi-e, pi-e, pi-e) representation of a small
    rotation.
    """
    def c(i, j):
        return R[..., i, j]

    res0_raw = jnp.arctan2(c(1, 2), c(2, 2))
    c2 = jnp.sqrt(c(0, 0) ** 2 + c(0, 1) ** 2)
    # For (0,1,2) Eigen's branch condition is res0 > 0; inside the branch
    # res0 is shifted by -pi and the second angle uses -c2.
    flip = res0_raw > 0
    res0 = jnp.where(flip, res0_raw - jnp.pi, res0_raw)
    res1 = jnp.arctan2(-c(0, 2), jnp.where(flip, -c2, c2))
    s1, c1 = jnp.sin(res0), jnp.cos(res0)
    res2 = jnp.arctan2(s1 * c(2, 0) - c1 * c(1, 0), c1 * c(1, 1) - s1 * c(2, 1))
    res = jnp.stack([res0, res1, res2], axis=-1)
    return -res  # (!odd) -> negate


def rotation_within_threshold(q_delta: jax.Array, threshold_deg) -> jax.Array:
    """Reference divergence guard predicate (src/lidar_odometry.cpp:56-58).

    True iff every eulerAngles(0,1,2) component of the delta rotation is
    within `threshold_deg` of 0 or of 180 degrees.
    """
    ang = jnp.abs(euler_angles_xyz(quat_to_matrix(q_delta))) * (180.0 / jnp.pi)
    thr = jnp.asarray(threshold_deg, ang.dtype)
    ok = (ang < thr) | (ang > 180.0 - thr)
    return jnp.all(ok, axis=-1)
