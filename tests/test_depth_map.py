"""Lidar-depth buckets + queries vs analytic scenes."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu.config import VisualConfig
from vloam_tpu.ops.depth_map import build_buckets, bucket_shape, project_cloud, query_depth

VC = VisualConfig(img_height=376, img_width=1248)


def _plane_cloud(n, rng, z0=10.0):
    """Points on a fronto-parallel plane at depth z0, in camera frame."""
    u = rng.uniform(0, VC.img_width, n)
    v = rng.uniform(0, VC.img_height, n)
    K = np.array([[700.0, 0, 624], [0, 700.0, 188], [0, 0, 1]], np.float32)
    x = (u - 624) / 700 * z0
    y = (v - 188) / 700 * z0
    return np.stack([x, y, np.full(n, z0)], -1).astype(np.float32), K


def test_project_and_query_plane(rng):
    pts, K = _plane_cloud(30000, rng)
    proj = np.zeros((3, 4), np.float32)
    proj[:, :3] = K
    uvz, ok = project_cloud(jnp.array(pts), jnp.ones(len(pts), bool), jnp.array(proj), VC)
    assert int(ok.sum()) == len(pts)
    bk = build_buckets(uvz, ok, VC)
    q = jnp.array(rng.uniform(100, 1100, size=(64, 2)).astype(np.float32))
    q = q.at[:, 1].set(jnp.array(rng.uniform(50, 320, 64).astype(np.float32)))
    d = np.asarray(query_depth(bk, q, VC))
    valid = d > 0
    assert valid.sum() > 50
    np.testing.assert_allclose(d[valid], 10.0, atol=0.01)


def test_query_depth_fails_without_neighbors(rng):
    pts, K = _plane_cloud(30, rng)  # extremely sparse
    proj = np.zeros((3, 4), np.float32)
    proj[:, :3] = K
    uvz, ok = project_cloud(jnp.array(pts), jnp.ones(len(pts), bool), jnp.array(proj), VC)
    bk = build_buckets(uvz, ok, VC)
    d = np.asarray(query_depth(bk, jnp.array([[600.0, 200.0]]), VC))
    assert d[0] == -1.0


def test_behind_camera_rejected():
    pts = np.array([[0.0, 0.0, -5.0], [0.0, 0.0, 5.0]], np.float32)
    K = np.array([[700.0, 0, 624], [0, 700.0, 188], [0, 0, 1]], np.float32)
    proj = np.zeros((3, 4), np.float32)
    proj[:, :3] = K
    _, ok = project_cloud(jnp.array(pts), jnp.ones(2, bool), jnp.array(proj), VC)
    assert not bool(ok[0]) and bool(ok[1])


def test_depth_spread_gate(rng):
    # two interleaved planes -> queries at the seam must be rejected
    near, K = _plane_cloud(20000, rng, z0=5.0)
    far, _ = _plane_cloud(20000, rng, z0=30.0)
    left = near[near[:, 0] < 0]    # left half of image
    right = far[far[:, 0] >= 0]
    pts = np.concatenate([left, right])
    proj = np.zeros((3, 4), np.float32)
    proj[:, :3] = K
    uvz, ok = project_cloud(jnp.array(pts), jnp.ones(len(pts), bool), jnp.array(proj), VC)
    bk = build_buckets(uvz, ok, VC)
    d_seam = np.asarray(query_depth(bk, jnp.array([[624.0, 188.0]]), VC))
    d_left = np.asarray(query_depth(bk, jnp.array([[300.0, 188.0]]), VC))
    assert d_seam[0] == -1.0          # straddles the discontinuity
    np.testing.assert_allclose(d_left[0], 5.0, atol=0.05)
