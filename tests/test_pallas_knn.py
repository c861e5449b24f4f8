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


# ---------------------------------------------------------------------------
# Pruned pair kernel (knn_lanemin_pair with prune_radius)
# ---------------------------------------------------------------------------

def _run_pair_pruned(qa, ca, ma, qb, cb, mb, r, counts=None):
    from vloam_tpu.ops.pallas_knn import knn_lanemin_pair

    counts = counts or ((None, None), (None, None))
    with pltpu.force_tpu_interpret_mode():
        (d2a, ia), (d2b, ib) = knn_lanemin_pair(
            jnp.array(qa), jnp.array(ca), jnp.array(ma), K,
            jnp.array(qb), jnp.array(cb), jnp.array(mb), K,
            a_counts=counts[0], b_counts=counts[1],
            prune_radius=(r, r), _force_tpu_path=True,
        )
    return (np.asarray(d2a), np.asarray(ia)), (np.asarray(d2b), np.asarray(ib))


def _check_radius_contract(q, cand, mask, d2, idx, r):
    """Every true neighbour within r with a unique lane class must be found;
    reported pairs beyond r may be +inf but never wrong-but-finite."""
    ref_d2, ref_idx = brute(q.astype(np.float64), cand.astype(np.float64), mask)
    for i in range(len(q)):
        true_in = [(j, d) for j, d in zip(ref_idx[i], ref_d2[i]) if d < r * r * 0.81]
        lanes = [j % 128 for j, _ in true_in]
        if len(set(lanes)) == len(lanes):                 # distinct lane classes
            got = set(idx[i][np.isfinite(d2[i])])
            for j, _ in true_in:
                assert j in got, (i, j)
        # finite reported distances must be genuine distances
        fin = np.isfinite(d2[i])
        re_d2 = np.sum((cand[idx[i]] - q[i]) ** 2, axis=-1)
        ok = fin & (d2[i] < 1e5)
        np.testing.assert_allclose(d2[i][ok], re_d2[ok], rtol=5e-2, atol=2e-3)


def test_pair_pruned_matches_within_radius(rng):
    """Morton-ish clustered layout: pruning must keep every within-radius
    neighbour while skipping far tiles."""
    from vloam_tpu.ops.knn import morton_sort

    M, N, R = 256, 4096, 1.0
    # queries clustered along a line (like a voxel-downsampled road scene)
    qa = (rng.uniform(0, 1, (M, 1)) * np.array([80, 4, 2])).astype(np.float32)
    qa += rng.normal(0, 1.0, (M, 3)).astype(np.float32)
    ca = (rng.uniform(0, 1, (N, 1)) * np.array([80, 4, 2])).astype(np.float32)
    ca += rng.normal(0, 1.2, (N, 3)).astype(np.float32)
    ma = rng.random(N) < 0.9
    ca_s, ma_s = morton_sort(jnp.array(ca), jnp.array(ma), cell=2.0)
    qa_s, _ = morton_sort(jnp.array(qa), jnp.ones(M, bool), cell=2.0)
    qa_s, ca_s, ma_s = np.asarray(qa_s), np.asarray(ca_s), np.asarray(ma_s)

    qb, cb, mb = qa_s + 1.5, ca_s.copy(), ma_s.copy()
    (d2a, ia), (d2b, ib) = _run_pair_pruned(qa_s, ca_s, ma_s, qb, cb, mb, R)
    _check_radius_contract(qa_s, ca_s, ma_s, d2a, ia, R)
    _check_radius_contract(qb, cb, mb, d2b, ib, R)


def test_pair_pruned_isolated_query_gets_inf(rng):
    """Far-from-map queries must report +inf or their true (huge) distance —
    never NaN, never a bogus small finite value — so the insert-dedup gate
    (nn > r_dedup^2) fires and the map grows into new areas."""
    M, N = 512, 2048
    qa = rng.uniform(-5, 5, (M, 3)).astype(np.float32)
    # rows 256.. form their own TM-block far from every candidate -> the
    # whole block is pruned against every tile -> pure +inf
    qa[256:] = rng.uniform(395, 405, (256, 3)).astype(np.float32)
    ca = rng.uniform(-6, 6, (N, 3)).astype(np.float32)
    ma = np.ones(N, bool)
    (d2a, _), _ = _run_pair_pruned(qa, ca, ma, qa + 0.1, ca, ma, 1.0)
    assert np.isinf(d2a[256:]).all()
    assert not np.isnan(d2a).any()
    assert (d2a[256:] > 1.0).all()          # dedup gate fires on every one


def test_pair_pruned_equals_unpruned_within_gate(rng):
    """Pruned and unpruned kernels agree exactly on every (query, neighbour)
    pair inside the gate radius."""
    from vloam_tpu.ops.pallas_knn import knn_lanemin_pair

    M, N, R = 256, 2048, 1.0
    qa = (rng.uniform(0, 1, (M, 1)) * np.array([40, 6, 2])).astype(np.float32)
    ca = qa[rng.integers(0, M, N)] + rng.normal(0, 0.8, (N, 3)).astype(np.float32)
    ma = np.ones(N, bool)
    qb, cb, mb = qa + 0.3, ca, ma
    with pltpu.force_tpu_interpret_mode():
        (p_d2, p_i), _ = knn_lanemin_pair(
            jnp.array(qa), jnp.array(ca), jnp.array(ma), K,
            jnp.array(qb), jnp.array(cb), jnp.array(mb), K,
            prune_radius=(R, R), _force_tpu_path=True,
        )
        (u_d2, u_i), _ = knn_lanemin_pair(
            jnp.array(qa), jnp.array(ca), jnp.array(ma), K,
            jnp.array(qb), jnp.array(cb), jnp.array(mb), K,
            _force_tpu_path=True,
        )
    p_d2, p_i, u_d2, u_i = map(np.asarray, (p_d2, p_i, u_d2, u_i))
    gate = u_d2 < R * R * 0.9
    assert (p_d2[gate] == u_d2[gate]).all()
    assert (p_i[gate] == u_i[gate]).all()
