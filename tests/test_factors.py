"""Solver-layer residual definitions vs NumPy oracles.

Covers the full factor inventory of the reference's L2 layer (SURVEY.md §2
rows 5 and 10): active VO residuals CostFunctor32/22, dead-code-but-present
CostFunctor33/23 (ceres_cost_function.h:10-189), lidar edge/plane factors
and the unused LidarDistanceFactor (lidarFactor.hpp:14-177).
"""

import numpy as np

from vloam_tpu import geometry as geo
from vloam_tpu.ops import lidar_factors as lf
from vloam_tpu.ops import vo_factors as vf


def _rand_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3) * 0.5
    return np.concatenate([q, t]).astype(np.float32)


def _rotmat(q):
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_reproj_32(rng):
    pose = _rand_pose(rng)
    X0 = rng.normal(size=(32, 3)).astype(np.float32) + np.array([0, 0, 8.0], np.float32)
    xbar = rng.normal(size=(32, 2)).astype(np.float32) * 0.3
    r = np.asarray(vf.reproj_32_residual(pose, X0, xbar))
    Y = X0 @ _rotmat(pose[:4]).T + pose[4:]
    want = np.stack([Y[:, 0] - Y[:, 2] * xbar[:, 0], Y[:, 1] - Y[:, 2] * xbar[:, 1]], -1)
    np.testing.assert_allclose(r, want, atol=1e-4)


def test_epipolar_22(rng):
    pose = _rand_pose(rng)
    x0 = rng.normal(size=(16, 2)).astype(np.float32) * 0.3
    x1 = rng.normal(size=(16, 2)).astype(np.float32) * 0.3
    r = np.asarray(vf.epipolar_22_residual(pose, x0, x1))
    R, t = _rotmat(pose[:4]), pose[4:]
    X0 = np.concatenate([x0, np.ones((16, 1))], -1)
    X1 = np.concatenate([x1, np.ones((16, 1))], -1)
    want = np.sum(X1 * np.cross(np.broadcast_to(t, (16, 3)), X0 @ R.T), -1, keepdims=True)
    np.testing.assert_allclose(r, want, atol=1e-4)


def test_point_33(rng):
    pose = _rand_pose(rng)
    X0 = rng.normal(size=(16, 3)).astype(np.float32)
    X1 = rng.normal(size=(16, 3)).astype(np.float32)
    r = np.asarray(vf.point_33_residual(pose, X0, X1))
    want = X0 @ _rotmat(pose[:4]).T + pose[4:] - X1
    np.testing.assert_allclose(r, want, atol=1e-5)


def test_inverse_23(rng):
    """CostFunctor23 semantics: Y = R^T (X1 - t) compared against xbar0."""
    pose = _rand_pose(rng)
    x0 = rng.normal(size=(16, 2)).astype(np.float32) * 0.3
    X1 = rng.normal(size=(16, 3)).astype(np.float32) + np.array([0, 0, 8.0], np.float32)
    r = np.asarray(vf.inverse_23_residual(pose, x0, X1))
    Y = (X1 - pose[4:]) @ _rotmat(pose[:4])
    want = np.stack([Y[:, 0] - Y[:, 2] * x0[:, 0], Y[:, 1] - Y[:, 2] * x0[:, 1]], -1)
    np.testing.assert_allclose(r, want, atol=1e-4)


def test_23_inverts_32(rng):
    """A perfect 3D-2D correspondence is also a perfect 2D-3D one: project a
    point with the pose, then both functors must vanish on the pair."""
    pose = _rand_pose(rng)
    X0 = rng.normal(size=(8, 3)).astype(np.float32) + np.array([0, 0, 10.0], np.float32)
    Y = np.asarray(geo.pose_apply(pose, X0))
    xbar1 = Y[:, :2] / Y[:, 2:]
    xbar0 = X0[:, :2] / X0[:, 2:]
    np.testing.assert_allclose(
        np.asarray(vf.reproj_32_residual(pose, X0, xbar1)), 0.0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(vf.inverse_23_residual(pose, xbar0, Y)), 0.0, atol=1e-4
    )


def test_edge_residual(rng):
    pose = _rand_pose(rng)
    p = rng.normal(size=(16, 3)).astype(np.float32)
    a = rng.normal(size=(16, 3)).astype(np.float32)
    b = rng.normal(size=(16, 3)).astype(np.float32)
    r = np.asarray(lf.edge_residual(pose, p, a, b))
    lp = p @ _rotmat(pose[:4]).T + pose[4:]
    want = np.cross(lp - a, lp - b) / np.linalg.norm(a - b, axis=-1, keepdims=True)
    np.testing.assert_allclose(r, want, atol=1e-4)
    # a point on the line a-b has zero residual
    mid = 0.5 * (a + b)
    p_on = np.asarray(geo.pose_apply(geo.pose_inverse(pose), mid))
    np.testing.assert_allclose(np.asarray(lf.edge_residual(pose, p_on, a, b)), 0.0, atol=1e-3)


def test_plane_residual(rng):
    pose = _rand_pose(rng)
    p = rng.normal(size=(16, 3)).astype(np.float32)
    n = rng.normal(size=(16, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.normal(size=16).astype(np.float32)
    r = np.asarray(lf.plane_residual(pose, p, n, d))
    lp = p @ _rotmat(pose[:4]).T + pose[4:]
    np.testing.assert_allclose(r[:, 0], np.sum(n * lp, -1) + d, atol=1e-4)


def test_plane_from_three_points(rng):
    j = rng.normal(size=(8, 3)).astype(np.float32)
    l = rng.normal(size=(8, 3)).astype(np.float32)
    m = rng.normal(size=(8, 3)).astype(np.float32)
    n, d = lf.plane_from_three_points(j, l, m)
    n, d = np.asarray(n), np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    for pt in (j, l, m):
        np.testing.assert_allclose(np.sum(n * pt, -1) + d, 0.0, atol=1e-4)


def test_distance_residual(rng):
    pose = _rand_pose(rng)
    p = rng.normal(size=(16, 3)).astype(np.float32)
    c = rng.normal(size=(16, 3)).astype(np.float32)
    r = np.asarray(lf.distance_residual(pose, p, c))
    want = p @ _rotmat(pose[:4]).T + pose[4:] - c
    np.testing.assert_allclose(r, want, atol=1e-5)
    # exact correspondences: residual vanishes
    c_exact = np.asarray(geo.pose_apply(pose, p))
    np.testing.assert_allclose(np.asarray(lf.distance_residual(pose, p, c_exact)), 0.0, atol=1e-5)
