"""geometry_np (host f64 pose algebra) matches vloam_tpu.geometry exactly
(same (x,y,z,w)/[q|t] layouts) and composes drift-free at km scale."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu import geometry as geo
from vloam_tpu import geometry_np as gnp


def _rand_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.concatenate([q, rng.uniform(-5, 5, 3)])


def test_matches_device_geometry(rng):
    for _ in range(20):
        a, b = _rand_pose(rng), _rand_pose(rng)
        ref = np.asarray(geo.pose_compose(jnp.array(a, jnp.float32), jnp.array(b, jnp.float32)))
        got = gnp.pose_compose(a, b)
        np.testing.assert_allclose(got, ref, atol=1e-5)
        np.testing.assert_allclose(
            gnp.pose_inverse(a),
            np.asarray(geo.pose_inverse(jnp.array(a, jnp.float32))), atol=1e-5,
        )
        np.testing.assert_allclose(
            gnp.pose_to_matrix(a),
            np.asarray(geo.pose_to_matrix(jnp.array(a, jnp.float32))), atol=1e-5,
        )


def test_inverse_roundtrip(rng):
    p = _rand_pose(rng)
    r = gnp.pose_compose(p, gnp.pose_inverse(p))
    np.testing.assert_allclose(r, gnp.pose_identity(), atol=1e-12)


def test_f64_chain_beats_f32_at_km_scale(rng):
    """Composing 5000 one-metre steps: the f64 chain tracks the exact sum;
    an f32 chain accumulates visible error — the reason the driver rebases
    device deltas onto the host f64 chain (Ceres-doubles semantics,
    laser_odometry.cpp:524-525)."""
    step = np.array([0, 0, np.sin(2e-4), np.cos(2e-4), 1.0, 0.0, 0.0])
    w64 = gnp.pose_identity()
    w32 = np.asarray(geo.pose_identity())
    for _ in range(5000):
        w64 = gnp.pose_compose(w64, step)
        w32 = np.asarray(geo.pose_compose(
            jnp.array(w32, jnp.float32), jnp.array(step, jnp.float32)
        ))
    # exact circle-arc endpoint for yaw rate 4e-4/frame, 1 m steps
    yaw = 4e-4 * np.arange(5000)
    exact = np.array([np.sum(np.cos(yaw)), np.sum(np.sin(yaw))])
    err64 = np.linalg.norm(w64[4:6] - exact)
    err32 = np.linalg.norm(w32[4:6] - exact)
    assert err64 < 1e-6
    assert err64 < err32  # f32 compose rounding is visible at this scale
