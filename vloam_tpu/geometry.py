"""SO(3)/SE(3) primitives on quaternions, angle-axis and rigid transforms.

All functions are pure jnp, shape-polymorphic over leading batch dims, and
f32-safe (normalisation guards).  Conventions:

* Quaternions are stored ``(x, y, z, w)`` (Eigen/tf2 memory order, matching
  the reference's ``para_q[4]`` layout, see
  /root/reference/src/lidar_odometry_mapping/include/lidar_odometry_mapping/laser_odometry.h:127-131).
* ``Pose`` is a (quat, t) pair packed as a length-7 vector ``[qx qy qz qw tx ty tz]``.
* ``pose_apply(T, p) = R(q) @ p + t``.
* Identity slerp semantics follow Eigen's ``Quaterniond::Identity().slerp(s, q)``
  used by the reference's undistortion hooks
  (/root/reference/src/lidar_odometry_mapping/src/laser_odometry.cpp:163).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------------
# Quaternion ops (xyzw)
# ----------------------------------------------------------------------------

QUAT_EPS = 1e-12


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, QUAT_EPS)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both xyzw."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the 2-cross-product form (15 mul + 15 add), cheaper than forming R.
    Broadcasts over leading dims.
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(xyz, v)
    return v + w * t + jnp.cross(xyz, t)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    x, y, z, w = jnp.moveaxis(q, -1, 0)
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
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (xyzw), branch-free Shepperd's method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically safest via argmax.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, QUAT_EPS)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]

    cand = jnp.stack(
        [
            jnp.stack([(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0), w0], axis=-1),
            jnp.stack([x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1), (m21 - m12) / (4 * x1)], axis=-1),
            jnp.stack([(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2), (m02 - m20) / (4 * y2)], axis=-1),
            jnp.stack([(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3, (m10 - m01) / (4 * z3)], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    idx = jnp.argmax(jnp.stack([tr, m00, m11, m22], axis=-1), axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_slerp_identity(q: jax.Array, s: jax.Array) -> jax.Array:
    """Eigen-style ``Identity().slerp(s, q)``: interpolate from identity to q.

    Matches the reference's interpolation-factor semantics in
    LidarEdgeFactor/LidarPlaneFactor (lidarFactor.hpp:30-33) and
    TransformToStart (laser_odometry.cpp:163).  Handles the small-angle case
    with a lerp fallback; takes the short arc (flips sign if w < 0).
    """
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    theta = jnp.arccos(w)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    safe_sin = jnp.where(small, 1.0, sin_theta)
    w_id = jnp.where(small, 1.0 - s, jnp.sin((1.0 - s) * theta) / safe_sin)
    w_q = jnp.where(small, s, jnp.sin(s * theta) / safe_sin)
    ident = jnp.zeros_like(q).at[..., 3].set(1.0)
    return quat_normalize(w_id[..., None] * ident + w_q[..., None] * q)


# ----------------------------------------------------------------------------
# Angle-axis (the reference VO state, ceres_cost_function.h residuals)
# ----------------------------------------------------------------------------


def angle_axis_rotate(aa: jax.Array, v: jax.Array) -> jax.Array:
    """Rodrigues rotation of v by angle-axis aa (= ceres::AngleAxisRotatePoint).

    Safe at ||aa|| -> 0 via the Taylor form used by ceres.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    small = theta2 < 1e-12
    axis = aa / theta
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    rotated = (
        v * cos_t
        + jnp.cross(axis, v) * sin_t
        + axis * jnp.sum(axis * v, axis=-1, keepdims=True) * (1.0 - cos_t)
    )
    # first-order fallback: v + aa x v
    return jnp.where(small, v + jnp.cross(aa, v), rotated)


def quat_to_angle_axis(q: jax.Array) -> jax.Array:
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    xyz = q[..., :3]
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    scale = jnp.where(sin_half < 1e-8, 2.0, angle / jnp.maximum(sin_half, 1e-12))
    return xyz * scale[..., None]


def angle_axis_to_quat(aa: jax.Array) -> jax.Array:
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * theta
    small = theta < 1e-8
    k = jnp.where(small, 0.5, jnp.sin(half) / jnp.maximum(theta, 1e-12))
    xyz = aa * k
    w = jnp.where(small[..., 0], 1.0, jnp.cos(half[..., 0]))
    return quat_normalize(jnp.concatenate([xyz, w[..., None]], axis=-1))


# ----------------------------------------------------------------------------
# Pose = [qx qy qz qw tx ty tz]
# ----------------------------------------------------------------------------


def pose_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype=dtype)


def pose_from_qt(q: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([q, t], axis=-1)


def pose_q(p: jax.Array) -> jax.Array:
    return p[..., :4]


def pose_t(p: jax.Array) -> jax.Array:
    return p[..., 4:7]


def pose_apply(p: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(p[..., :4], v) + p[..., 4:7]


def pose_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a ∘ b: (a∘b)(x) = a(b(x))."""
    q = quat_mul(a[..., :4], b[..., :4])
    t = quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    return pose_from_qt(quat_normalize(q), t)


def pose_inverse(p: jax.Array) -> jax.Array:
    qinv = quat_conj(p[..., :4])
    return pose_from_qt(qinv, -quat_rotate(qinv, p[..., 4:7]))


def pose_to_matrix(p: jax.Array) -> jax.Array:
    """Pose -> 4x4 homogeneous matrix."""
    m = jnp.zeros(p.shape[:-1] + (4, 4), dtype=p.dtype)
    m = m.at[..., :3, :3].set(quat_to_matrix(p[..., :4]))
    m = m.at[..., :3, 3].set(p[..., 4:7])
    return m.at[..., 3, 3].set(1.0)


def pose_from_matrix(m: jax.Array) -> jax.Array:
    return pose_from_qt(matrix_to_quat(m[..., :3, :3]), m[..., :3, 3])
