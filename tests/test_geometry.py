"""Geometry unit tests vs scipy/NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from vloam_tpu import geometry as geo


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_mat_np(q):
    # oracle: build via scipy-free formula, xyzw
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (32,))
    v = rng.normal(size=(32, 3))
    out = np.asarray(geo.quat_rotate(jnp.array(q, jnp.float64), jnp.array(v, jnp.float64)))
    ref = np.einsum("nij,nj->ni", quat_to_mat_np(q), v)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_quat_mul_assoc_with_rotation(rng):
    a, b = random_quat(rng, (8,)), random_quat(rng, (8,))
    v = rng.normal(size=(8, 3))
    lhs = geo.quat_rotate(geo.quat_mul(jnp.array(a), jnp.array(b)), jnp.array(v, jnp.float32))
    rhs = geo.quat_rotate(jnp.array(a), geo.quat_rotate(jnp.array(b), jnp.array(v, jnp.float32)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    q = random_quat(rng, (64,))
    m = geo.quat_to_matrix(jnp.array(q, jnp.float32))
    q2 = np.asarray(geo.matrix_to_quat(m))
    # sign-insensitive comparison
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_angle_axis_rotate_matches_quat(rng):
    aa = rng.normal(size=(16, 3))
    v = rng.normal(size=(16, 3))
    q = geo.angle_axis_to_quat(jnp.array(aa, jnp.float32))
    out_aa = np.asarray(geo.angle_axis_rotate(jnp.array(aa, jnp.float32), jnp.array(v, jnp.float32)))
    out_q = np.asarray(geo.quat_rotate(q, jnp.array(v, jnp.float32)))
    np.testing.assert_allclose(out_aa, out_q, atol=1e-5)


def test_angle_axis_small_angle():
    aa = jnp.array([1e-10, -2e-10, 1e-10])
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(geo.angle_axis_rotate(aa, v)), np.asarray(v), atol=1e-7)


def test_quat_angle_axis_roundtrip(rng):
    aa = rng.normal(size=(32, 3)) * 0.5
    q = geo.angle_axis_to_quat(jnp.array(aa, jnp.float32))
    aa2 = np.asarray(geo.quat_to_angle_axis(q))
    np.testing.assert_allclose(aa2, aa, atol=1e-5)


def test_pose_compose_inverse(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3))
    p = geo.pose_from_qt(jnp.array(q, jnp.float32), jnp.array(t, jnp.float32))
    ident = geo.pose_compose(p, geo.pose_inverse(p))
    np.testing.assert_allclose(np.asarray(geo.pose_t(ident)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(geo.pose_q(ident))[..., 3]), 1.0, atol=1e-5)


def test_pose_apply_matches_matrix(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3))
    v = rng.normal(size=(8, 3))
    p = geo.pose_from_qt(jnp.array(q, jnp.float32), jnp.array(t, jnp.float32))
    m = np.asarray(geo.pose_to_matrix(p))
    ref = np.einsum("nij,nj->ni", m[:, :3, :3], v) + m[:, :3, 3]
    np.testing.assert_allclose(np.asarray(geo.pose_apply(p, jnp.array(v, jnp.float32))), ref, atol=1e-5)


def test_pose_matrix_roundtrip(rng):
    q = random_quat(rng, (8,))
    t = rng.normal(size=(8, 3))
    p = geo.pose_from_qt(jnp.array(q, jnp.float32), jnp.array(t, jnp.float32))
    p2 = geo.pose_from_matrix(geo.pose_to_matrix(p))
    v = jnp.array(rng.normal(size=(8, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(geo.pose_apply(p, v)), np.asarray(geo.pose_apply(p2, v)), atol=1e-5)


@pytest.mark.parametrize("s", [0.0, 0.25, 0.5, 1.0])
def test_slerp_identity_endpoints(rng, s):
    q = random_quat(rng, (8,))
    q = np.where(q[..., 3:] < 0, -q, q)
    out = np.asarray(geo.quat_slerp_identity(jnp.array(q, jnp.float32), jnp.float32(s)))
    if s == 0.0:
        np.testing.assert_allclose(out[..., 3], 1.0, atol=1e-5)
        np.testing.assert_allclose(out[..., :3], 0.0, atol=1e-5)
    elif s == 1.0:
        np.testing.assert_allclose(out, q, atol=1e-5)
    else:
        # slerp of identity->q equals angle-axis scaling by s
        aa = np.asarray(geo.quat_to_angle_axis(jnp.array(q, jnp.float32)))
        expect = np.asarray(geo.angle_axis_to_quat(jnp.array(aa * s, jnp.float32)))
        np.testing.assert_allclose(out, expect, atol=1e-5)
