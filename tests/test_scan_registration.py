"""Scan registration invariants (reference selection semantics) on synthetic scans."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu.config import ScanConfig
from vloam_tpu.data import synthetic
from vloam_tpu.ops.scan_registration import (
    assign_rings,
    extract_features,
    organize_scan,
    ring_curvature,
)

CFG = ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=16384)


@pytest.fixture(scope="module")
def scan():
    scene = synthetic.default_scene()
    pts = synthetic.simulate_scan(np.eye(3), np.zeros(3), scene, n_azimuth=700, noise=0.002, seed=3)
    return synthetic.pad_cloud(pts, CFG.max_points)


@pytest.fixture(scope="module")
def feats(scan):
    p, m = scan
    return jax.jit(lambda p, m: extract_features(p, m, CFG))(jnp.array(p), jnp.array(m))


def test_ring_assignment_formula():
    # KITTI 64-beam formula spot checks (scan_registration.cpp:241-254)
    pts = np.array(
        [
            [10.0, 0.0, 10.0 * np.tan(np.radians(1.0))],    # angle=+1 -> ring 3
            [10.0, 0.0, 10.0 * np.tan(np.radians(-5.0))],   # angle=-5 -> ring 21
            [10.0, 0.0, 10.0 * np.tan(np.radians(-10.0))],  # angle=-10 -> 32+int(2.34)=34
            [10.0, 0.0, 10.0 * np.tan(np.radians(3.0))],    # angle>2 -> invalid
        ],
        np.float32,
    )
    ring, ok = assign_rings(jnp.array(pts), jnp.ones(4, bool), CFG)
    ring, ok = np.asarray(ring), np.asarray(ok)
    assert ring[0] == int((2 - 1.0) * 3 + 0.5)
    assert ring[1] == int((2 + 5.0) * 3 + 0.5)
    assert ring[2] == 32 + int((-8.83 + 10.0) * 2 + 0.5)
    assert not ok[3] and ok[:3].all()


def test_organize_preserves_order(scan):
    p, m = scan
    grid, gmask, n_per = organize_scan(jnp.array(p), jnp.array(m), CFG)
    grid, gmask = np.asarray(grid), np.asarray(gmask)
    n_per = np.asarray(n_per)
    # valid cells are a prefix of each ring
    for r in range(0, 64, 13):
        assert gmask[r, : n_per[r]].all() and not gmask[r, n_per[r]:].any()
    # azimuth (rel-time channel) is monotonically non-decreasing within a ring
    w = grid[..., 3] - np.floor(grid[..., 3])
    for r in range(0, 64, 13):
        if n_per[r] > 10:
            ww = w[r, : n_per[r]]
            frac_violations = (np.diff(ww) < -1e-4).mean()
            assert frac_violations < 0.01


def test_selection_counts(feats):
    S = CFG.n_sectors
    sharp = np.asarray(feats.sharp_mask).reshape(CFG.n_scans, S, CFG.max_sharp)
    less = np.asarray(feats.less_sharp_mask).reshape(CFG.n_scans, S, CFG.max_less_sharp)
    flat = np.asarray(feats.flat_mask).reshape(CFG.n_scans, S, CFG.max_flat)
    assert sharp.sum(-1).max() <= CFG.max_sharp
    assert less.sum(-1).max() <= CFG.max_less_sharp
    assert flat.sum(-1).max() <= CFG.max_flat
    # sharp picks are the first slots of less-sharp
    np.testing.assert_array_equal(sharp, less[..., : CFG.max_sharp])
    assert sharp.sum() > 50 and flat.sum() > 200


def test_curvature_thresholds(scan, feats):
    p, m = scan
    grid, gmask, n_per = organize_scan(jnp.array(p), jnp.array(m), CFG)
    curv, sel = ring_curvature(grid, n_per, CFG)
    curv = np.asarray(curv)

    def lookup_curv(pts, mask):
        g = np.asarray(grid).reshape(-1, 4)
        out = []
        for q in pts[mask]:
            j = np.argmin(((g - q) ** 2).sum(-1))
            out.append(curv.reshape(-1)[j])
        return np.array(out)

    sharp_c = lookup_curv(np.asarray(feats.sharp), np.asarray(feats.sharp_mask))
    flat_c = lookup_curv(np.asarray(feats.flat), np.asarray(feats.flat_mask))
    assert (sharp_c > CFG.edge_threshold).all()
    assert (flat_c < CFG.surf_threshold).all()


def test_neighbor_suppression(feats):
    # no two selected edge points within +-5 columns in the same ring,
    # unless separated by a large gap (the 0.05 m^2 break)
    less = np.asarray(feats.less_sharp).reshape(-1, 4)
    mask = np.asarray(feats.less_sharp_mask)
    pts = less[mask]
    ring = np.floor(pts[:, 3]).astype(int)
    close_pairs = 0
    for r in np.unique(ring):
        sel = pts[ring == r][:, :3]
        if len(sel) < 2:
            continue
        d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
        np.fill_diagonal(d, 1e9)
        # suppression works in index space; in metric space neighbouring
        # points are ~0.05-0.3 m apart at range, so just check no duplicates
        close_pairs += (d < 1e-6).sum()
    assert close_pairs == 0


def test_less_flat_excludes_edges(feats):
    lf = np.asarray(feats.less_flat)[np.asarray(feats.less_flat_mask)]
    sh = np.asarray(feats.sharp)[np.asarray(feats.sharp_mask)]
    if len(lf) and len(sh):
        d = np.linalg.norm(lf[:, None, :3] - sh[None, :, :3], axis=-1)
        # voxel centroids can sit near an edge, but exact matches should not occur
        assert (d.min(axis=0) > 1e-7).all()
