"""Fused lane-min knn kernel (ops/pallas_knn.py) vs NumPy oracle.

Runs the kernel in pallas interpret mode (CPU).  The contract is the
approx_min_k-style one documented in the op: every true neighbour whose
lane class (idx % 128) is unique among the true k-NN must be returned
exactly; reported d2 may be floor-rounded by 2^-14 relative (9 packed
mantissa bits).  Hardware timing/validation: tools/profile_knn.py.
"""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vloam_tpu.ops.pallas_knn import knn_lanemin

K = 5


def brute(q, cand, mask):
    d2 = np.sum((q[:, None, :] - cand[None, :, :]) ** 2, axis=-1)
    d2[:, ~mask] = np.inf
    idx = np.argsort(d2, axis=1)[:, :K]
    return np.take_along_axis(d2, idx, axis=1), idx


def run(q, cand, mask):
    with pltpu.force_tpu_interpret_mode():
        d2, idx = knn_lanemin(jnp.array(q), jnp.array(cand), jnp.array(mask), K)
    return np.asarray(d2), np.asarray(idx)


def test_distinct_lane_classes_exact(rng):
    """Candidates laid out so each query's true 5-NN occupy distinct lanes."""
    M, N = 300, 4096
    centers = rng.uniform(-50, 50, (M, 3)).astype(np.float32)
    cand = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
    # plant 5 known near neighbours per query at consecutive indices
    # (consecutive => distinct lane classes), all nearer than the background
    for i in range(M):
        base = (i * 13) % (N - 8)
        cand[base:base + K] = centers[i] + rng.normal(0, 0.05, (K, 3))
    mask = np.ones(N, bool)
    d2, idx = run(centers, cand, mask)
    ref_d2, ref_idx = brute(centers.astype(np.float64), cand.astype(np.float64), mask)
    # the planted neighbours dominate and have distinct lanes -> exact sets
    assert (np.sort(idx, axis=1) == np.sort(ref_idx, axis=1)).mean() > 0.99
    np.testing.assert_allclose(d2, ref_d2, rtol=5e-2, atol=2e-3)


def test_reported_d2_matches_reported_idx(rng):
    M, N = 256, 2048
    q = rng.uniform(-20, 20, (M, 3)).astype(np.float32)
    cand = rng.uniform(-25, 25, (N, 3)).astype(np.float32)
    mask = rng.random(N) < 0.8
    d2, idx = run(q, cand, mask)
    gathered = cand[idx]                      # (M, K, 3)
    d2_re = np.sum((gathered - q[:, None, :]) ** 2, axis=-1)
    ok = d2 < 1e5                             # below sentinel distances
    np.testing.assert_allclose(d2[ok], d2_re[ok], rtol=5e-2, atol=2e-3)
    # masked-out candidates never returned below the sentinel
    assert mask[idx[ok]].all()


def test_random_recall(rng):
    M, N = 256, 8192
    q = rng.uniform(-30, 30, (M, 3)).astype(np.float32)
    cand = rng.uniform(-30, 30, (N, 3)).astype(np.float32)
    mask = np.ones(N, bool)
    d2, idx = run(q, cand, mask)
    _, ref_idx = brute(q.astype(np.float64), cand.astype(np.float64), mask)
    recall = np.mean([len(set(idx[i]) & set(ref_idx[i])) / K for i in range(M)])
    assert recall > 0.9, recall


def test_all_masked_returns_sentinel():
    q = np.zeros((8, 3), np.float32)
    cand = np.ones((512, 3), np.float32)
    d2, _ = run(q, cand, np.zeros(512, bool))
    assert (d2 > 1e10).all()
