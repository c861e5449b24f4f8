"""Undistortion path (odom.distortion): slerp oracle + end-to-end recovery.

Reference semantics: TransformToStart (laser_odometry.cpp:150-173) and the
factors' interpolation parameter s (lidarFactor.hpp:30-44).  KITTI runs with
DISTORTION=false; these tests prove the flag actually flips behavior and the
interpolated path inverts a genuinely motion-distorted sweep.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu import geometry as geo
from vloam_tpu.config import OdometryConfig, ScanConfig, kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.models.lidar_odometry import init_lo_state, lo_step
from vloam_tpu.ops.lidar_factors import pose_apply_interp
from vloam_tpu.ops.scan_registration import extract_features


def _np_slerp_identity(q, s):
    """NumPy oracle of Eigen's Identity().slerp(s, q) (xyzw)."""
    q = np.asarray(q, np.float64)
    if q[3] < 0:
        q = -q
    w = min(max(q[3], -1.0), 1.0)
    th = np.arccos(w)
    if np.sin(th) < 1e-5:
        out = (1.0 - s) * np.array([0, 0, 0, 1.0]) + s * q
    else:
        out = (np.sin((1.0 - s) * th) * np.array([0, 0, 0, 1.0]) + np.sin(s * th) * q) / np.sin(th)
    return out / np.linalg.norm(out)


def _np_quat_rotate(q, v):
    x, y, z, w = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    return R @ v


def test_pose_apply_interp_matches_numpy_oracle(rng):
    """pose_apply_interp == the reference's TransformToStart, point by point."""
    aa = rng.normal(0, 0.1, 3).astype(np.float32)
    t = rng.normal(0, 1.0, 3).astype(np.float32)
    q = geo.angle_axis_to_quat(jnp.array(aa))
    pose = geo.pose_from_qt(q, jnp.array(t))

    pts = rng.uniform(-20, 20, (64, 3)).astype(np.float32)
    s = rng.uniform(0, 1, 64).astype(np.float32)

    got = np.asarray(pose_apply_interp(pose, jnp.array(pts), jnp.array(s)))
    qn = np.asarray(q)
    for i in range(64):
        q_s = _np_slerp_identity(qn, float(s[i]))
        want = _np_quat_rotate(q_s, pts[i].astype(np.float64)) + s[i] * t
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_interp_s1_equals_plain_apply(rng):
    pose = geo.pose_from_qt(
        geo.angle_axis_to_quat(jnp.array(rng.normal(0, 0.2, 3), jnp.float32)),
        jnp.array(rng.normal(0, 1, 3), jnp.float32),
    )
    pts = jnp.array(rng.uniform(-10, 10, (32, 3)).astype(np.float32))
    a = pose_apply_interp(pose, pts, jnp.ones((32,), jnp.float32))
    b = geo.pose_apply(pose, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_lo_distortion_flag_flips_behavior_and_recovers_motion():
    """Rigid bootstrap frame (= a perfectly end-transformed stored cloud),
    then ONE motion-distorted sweep: the interpolated solve must recover the
    true frame-to-frame delta; the rigid-sweep (s = 1) assumption must show
    the acquisition-model bias.  This isolates the TransformToStart + factor
    slerp semantics from the multi-frame bootstrap transient (the reference
    has the same transient: its TransformToEnd call site is disabled).
    """
    base = kitti_hdl64().replace(
        scan=ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=16384)
    )
    scene = synthetic.default_scene()
    speed, yaw_rate = 1.2, 0.02
    poses = synthetic.straight_trajectory(3, speed=speed, yaw_rate=yaw_rate)
    (R1, t1), (R2, t2) = poses[1], poses[2]
    t_true = R1.T @ (t2 - t1)

    # frame A: rigid snapshot at anchor 1 (what TransformToEnd stores);
    # frame B: genuinely distorted over anchors 1 -> 2
    pts_a = synthetic.simulate_scan(R1, t1, scene, n_azimuth=700, noise=0.004, seed=1)
    pts_b = synthetic.simulate_scan_distorted(
        R1, t1, R2, t2, scene, n_azimuth=700, noise=0.004, seed=2
    )

    def run(distortion):
        cfg = base.replace(odom=OdometryConfig(distortion=distortion))
        state = init_lo_state(cfg)
        step = jax.jit(
            lambda s, p, m: lo_step(s, extract_features(p, m, cfg.scan), cfg)[:2]
        )
        for pts in (pts_a, pts_b):
            p, m = synthetic.pad_cloud(pts, cfg.scan.max_points)
            state, delta = step(state, jnp.array(p), jnp.array(m))
        return float(np.linalg.norm(np.asarray(delta)[4:] - t_true))

    err_on, err_off = run(True), run(False)
    # the undistorted solve lands on the true delta...
    assert err_on < 0.08, (err_on, err_off)
    # ...while the rigid-sweep assumption carries the distortion bias
    assert err_on < 0.5 * err_off, (err_on, err_off)
