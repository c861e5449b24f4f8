"""Closed-form 3x3 eigensolver / solver vs NumPy."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu.ops.linalg3 import eigh3x3, solve3x3


def random_spd(rng, n, scale=1.0):
    A = rng.normal(size=(n, 3, 3)) * scale
    return (A @ np.transpose(A, (0, 2, 1))).astype(np.float32)


def test_eigh3x3_values_and_vectors(rng):
    A = random_spd(rng, 64)
    vals, vecs = eigh3x3(jnp.array(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref_vals = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(vals, ref_vals, rtol=2e-3, atol=2e-3)
    # eigenvector property: A v = lambda v
    for j in range(3):
        av = np.einsum("nij,nj->ni", A, vecs[:, :, j])
        lv = vals[:, j : j + 1] * vecs[:, :, j]
        np.testing.assert_allclose(av, lv, atol=5e-2 * np.abs(vals).max())


def test_eigh3x3_line_distribution(rng):
    # points along a line: largest eigval >> others, eigvec = line direction
    d = np.array([1.0, 2.0, -0.5])
    d = d / np.linalg.norm(d)
    t = rng.normal(size=(5, 1))
    pts = t * d[None] + rng.normal(scale=1e-3, size=(5, 3))
    zm = pts - pts.mean(0)
    cov = (zm.T @ zm).astype(np.float32)
    vals, vecs = eigh3x3(jnp.array(cov[None]))
    vals, vecs = np.asarray(vals)[0], np.asarray(vecs)[0]
    assert vals[2] > 100 * vals[1]
    assert abs(np.dot(vecs[:, 2], d)) > 0.999


def test_solve3x3(rng):
    A = random_spd(rng, 32) + 0.1 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    x = np.asarray(solve3x3(jnp.array(A), jnp.array(b)))
    ref = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, rtol=2e-2, atol=2e-3)
