"""Frame graph & VO/LO/MO coupling hub — reference: vloam_tf.cpp.

The reference routes every transform through the ROS tf2 tree plus ~20
public mutable members on VloamTF (vloam_tf.h:14-51).  Here the same role is
a small immutable pytree of poses threaded through the jitted pipeline step:

  * static extrinsics (KITTI): imu_T_velo, imu_T_cam0, base_T_imu
    -> derived base_T_cam0, velo_T_cam0 (vloam_tf.cpp:58-59)
  * VO coupling: velo_last_VOT_velo_curr =
      velo_T_cam0 o cam0_curr_VOT_cam0_last^-1 o velo_T_cam0^-1
    (vloam_tf.cpp:69-70) — the LO seed in coupled mode
  * world accumulation with the NaN guard of vloam_tf.cpp:76-79
  * trajectory export rebased to cam0 at the start frame
    (vloam_tf.cpp:84-160), byte-compatible "%f x12" rows so the reference's
    KITTI evaluation tooling runs unchanged.

Like the reference (laser_odometry.cpp:612-616), LO/MO deltas computed in
the velodyne frame are attributed to base_link directly — KITTI's
velo-to-base offset is treated as identity in the coupling chain.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vloam_tpu import geometry as geo


class Extrinsics(NamedTuple):
    base_T_cam0: jax.Array   # (7,)
    velo_T_cam0: jax.Array   # (7,)
    cam_T_velo: jax.Array    # (4, 4) float32 — the projection-chain matrix for depth assoc
    P_rect0: jax.Array       # (3, 4)
    R_rect0: jax.Array       # (4, 4)


def kitti_default_extrinsics() -> Extrinsics:
    """Nominal KITTI transforms for synthetic runs (cam0 z forward = velo x)."""
    import numpy as np

    velo_R_cam = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], np.float32)
    q = geo.matrix_to_quat(jnp.array(velo_R_cam))
    velo_T_cam0 = geo.pose_from_qt(q, jnp.zeros(3))
    cam_T_velo = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(jnp.array(velo_R_cam.T))
    P = jnp.zeros((3, 4), jnp.float32).at[:, :3].set(
        jnp.array([[718.856, 0, 624.0], [0, 718.856, 188.0], [0, 0, 1.0]], jnp.float32)
    )
    return Extrinsics(
        base_T_cam0=velo_T_cam0,   # base == velo for synthetic runs
        velo_T_cam0=velo_T_cam0,
        cam_T_velo=cam_T_velo,
        P_rect0=P,
        R_rect0=jnp.eye(4, dtype=jnp.float32),
    )


def vo_to_velo(cam0_curr_T_cam0_last: jax.Array, ext: Extrinsics) -> jax.Array:
    """velo_last_VOT_velo_curr (vloam_tf.cpp:69-70)."""
    return geo.pose_compose(
        geo.pose_compose(ext.velo_T_cam0, geo.pose_inverse(cam0_curr_T_cam0_last)),
        geo.pose_inverse(ext.velo_T_cam0),
    )


def accumulate_world(world_T_base: jax.Array, base_last_T_base_curr: jax.Array) -> jax.Array:
    """world_VOT_base_last *= delta, with the NaN guard (vloam_tf.cpp:76-79)."""
    new = geo.pose_compose(world_T_base, base_last_T_base_curr)
    ok = jnp.all(jnp.isfinite(new))
    return jnp.where(ok, new, world_T_base)


def lo_delta_to_cam0(velo_last_T_velo_curr: jax.Array, ext: Extrinsics) -> jax.Array:
    """cam0_curr_LOT_cam0_prev = base_T_cam0^-1 o delta^-1 o base_T_cam0
    (vloam_tf.cpp / laser_odometry.cpp:615-616) — the VO seed."""
    return geo.pose_compose(
        geo.pose_compose(geo.pose_inverse(ext.base_T_cam0), geo.pose_inverse(velo_last_T_velo_curr)),
        ext.base_T_cam0,
    )


def world_to_cam0_start(
    world_T_base: jax.Array,
    cam0_init_T_cam0_start: jax.Array,
    ext: Extrinsics,
) -> jax.Array:
    """cam0_start_T_cam0_last = (init_T_start)^-1 o base_T_cam0^-1 o world_T_base o base_T_cam0
    (vloam_tf.cpp:89-94)."""
    cam0_init_T_cam0_last = geo.pose_compose(
        geo.pose_compose(geo.pose_inverse(ext.base_T_cam0), world_T_base), ext.base_T_cam0
    )
    return geo.pose_compose(geo.pose_inverse(cam0_init_T_cam0_start), cam0_init_T_cam0_last)


def cam0_init_pose(world_T_base: jax.Array, ext: Extrinsics) -> jax.Array:
    """cam0_init_T_cam0_last before rebasing — captured at count==0 as the start frame."""
    return geo.pose_compose(
        geo.pose_compose(geo.pose_inverse(ext.base_T_cam0), world_T_base), ext.base_T_cam0
    )
