"""Essential-matrix RANSAC + 2D-only NLS solver (solveRANSAC /
solveNls2dOnly parity, reference visual_odometry.cpp:234-299)."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu import geometry as geo
from vloam_tpu.config import kitti_hdl64
from vloam_tpu.ops import epipolar
from vloam_tpu.models.visual_odometry import solve_nls_2d_only, solve_ransac


def _two_view(rng, n=400, yaw=0.02, t=(0.7, 0.05, 0.1)):
    """Random 3D scene viewed from identity and from (R, t); returns pixel
    correspondences and the ground-truth curr_T_last pose."""
    K = np.array([[718.0, 0, 607.0], [0, 718.0, 185.0], [0, 0, 1.0]])
    X = np.stack(
        [rng.uniform(-15, 15, n), rng.uniform(-3, 3, n), rng.uniform(6, 40, n)], -1
    )
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    t = np.asarray(t, np.float64)
    X1 = X @ R.T + t                      # curr_T_last applied to last-frame pts
    uv0 = (X @ K.T)[:, :2] / (X @ K.T)[:, 2:3]
    uv1 = (X1 @ K.T)[:, :2] / (X1 @ K.T)[:, 2:3]
    return K, uv0, uv1, R, t


def test_ransac_recovers_pose_with_outliers(rng):
    K, uv0, uv1, R, t = _two_view(rng)
    # 25% gross outliers
    n = uv0.shape[0]
    bad = rng.random(n) < 0.25
    uv1 = uv1.copy()
    uv1[bad] += rng.uniform(30, 80, (bad.sum(), 2))
    mask = np.ones(n, bool)

    pose, n_inl = solve_ransac(
        jnp.array(uv0, jnp.float32), jnp.array(uv1, jnp.float32),
        jnp.array(mask), jnp.array(K, jnp.float32),
    )
    est_R = np.asarray(geo.quat_to_matrix(pose[:4]))
    est_t = np.asarray(pose[4:])
    assert np.abs(est_R - R).max() < 5e-3
    # translation is unit-norm; check direction
    cos = est_t @ t / np.linalg.norm(t)
    assert cos > 0.99
    assert int(n_inl) > 0.6 * (~bad).sum()


def test_ransac_inliers_exclude_outliers(rng):
    K, uv0, uv1, _, _ = _two_view(rng, n=300)
    bad = np.zeros(300, bool)
    bad[:60] = True
    uv1 = uv1.copy()
    uv1[bad] += 50.0
    E, inl = epipolar.find_essential_ransac(
        jnp.array(uv0, jnp.float32), jnp.array(uv1, jnp.float32),
        jnp.array(np.ones(300, bool)), jnp.array(K, jnp.float32),
    )
    inl = np.asarray(inl)
    assert inl[bad].sum() == 0
    assert inl[~bad].sum() > 0.8 * (~bad).sum()


def test_masked_matches_never_sampled(rng):
    K, uv0, uv1, R, _ = _two_view(rng, n=200)
    # corrupt the masked-out half completely; the solve must ignore it
    uv1 = uv1.copy()
    uv1[100:] = rng.uniform(0, 1000, (100, 2))
    mask = np.arange(200) < 100
    pose, _ = solve_ransac(
        jnp.array(uv0, jnp.float32), jnp.array(uv1, jnp.float32),
        jnp.array(mask), jnp.array(K, jnp.float32),
    )
    est_R = np.asarray(geo.quat_to_matrix(pose[:4]))
    assert np.abs(est_R - R).max() < 5e-3


def test_nls_2d_only_rotation(rng):
    cfg = kitti_hdl64()
    K, uv0, uv1, R, t = _two_view(rng, n=500, yaw=0.015, t=(0.8, 0.0, 0.05))
    # seed near truth (the epipolar problem is scale-free and locally convex)
    q0 = geo.matrix_to_quat(jnp.array(R, jnp.float32))
    pose0 = geo.pose_from_qt(q0, jnp.array(t * 1.1, jnp.float32))
    pose = solve_nls_2d_only(
        jnp.array(uv0, jnp.float32), jnp.array(uv1, jnp.float32),
        jnp.array(np.ones(500, bool)), jnp.array(K, jnp.float32), cfg, pose0,
    )
    est_R = np.asarray(geo.quat_to_matrix(pose[:4]))
    est_t = np.asarray(pose[4:])
    assert np.abs(est_R - R).max() < 2e-3
    cos = est_t @ t / (np.linalg.norm(est_t) * np.linalg.norm(t))
    assert cos > 0.999
