"""Blocked matmul k-NN vs NumPy brute force."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu.ops.knn import knn, nn1


def test_knn_small_vs_numpy(rng):
    q = rng.normal(size=(37, 3)).astype(np.float32)
    c = rng.normal(size=(211, 3)).astype(np.float32)
    mask = rng.uniform(size=211) < 0.9
    d, i = knn(jnp.array(q), jnp.array(c), jnp.array(mask), 5)
    d, i = np.asarray(d), np.asarray(i)
    d2 = ((q[:, None] - c[None]) ** 2).sum(-1)
    d2[:, ~mask] = np.inf
    ref_i = np.argsort(d2, axis=1)[:, :5]
    ref_d = np.take_along_axis(d2, ref_i, axis=1)
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-5)
    # indices may tie; compare distances only where unique
    np.testing.assert_allclose(
        np.take_along_axis(d2, i, axis=1), ref_d, rtol=1e-4, atol=1e-5
    )


def test_knn_blocked_matches_single(rng):
    q = rng.normal(size=(16, 3)).astype(np.float32) * 5
    c = rng.normal(size=(1024, 3)).astype(np.float32) * 5
    mask = np.ones(1024, bool)
    d1, _ = knn(jnp.array(q), jnp.array(c), jnp.array(mask), 3, block=2048)
    d2, _ = knn(jnp.array(q), jnp.array(c), jnp.array(mask), 3, block=256)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-6)


def test_nn1_all_masked(rng):
    q = rng.normal(size=(4, 3)).astype(np.float32)
    c = rng.normal(size=(64, 3)).astype(np.float32)
    d, i = nn1(jnp.array(q), jnp.array(c), jnp.zeros(64, bool))
    assert (np.asarray(d) > 1e30).all()
