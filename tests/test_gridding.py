"""Host ring gridding (data/gridding.py) vs the device organize_scan oracle."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu.config import ScanConfig, kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.data.gridding import grid_cloud
from vloam_tpu.ops.scan_registration import extract_features, extract_features_from_grid, organize_scan


def _scan(seed=0, n_az=900):
    boxes = synthetic.default_scene()
    R = np.eye(3)
    return synthetic.simulate_scan(R, np.zeros(3), boxes, n_azimuth=n_az, noise=0.01, seed=seed)


def test_host_grid_matches_device():
    cfg = ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=8192)
    pts = _scan()
    padded, mask = synthetic.pad_cloud(pts, cfg.max_points)

    g_dev, m_dev, n_dev = organize_scan(jnp.array(padded), jnp.array(mask), cfg)
    g_host, m_host, n_host = grid_cloud(pts, cfg)

    np.testing.assert_array_equal(np.asarray(m_dev), m_host)
    np.testing.assert_array_equal(np.asarray(n_dev), n_host)
    np.testing.assert_allclose(np.asarray(g_dev), g_host, atol=1e-5)


def test_pre_gridded_features_match():
    cfg = ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=8192)
    pts = _scan(seed=3)
    padded, mask = synthetic.pad_cloud(pts, cfg.max_points)

    f_raw = extract_features(jnp.array(padded), jnp.array(mask), cfg)
    g, m, n = grid_cloud(pts, cfg)
    f_grid = extract_features_from_grid(jnp.array(g), jnp.array(m), jnp.array(n), cfg)

    for a, b, name in zip(f_raw, f_grid, f_raw._fields):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name)


def test_host_buckets_match_device():
    from vloam_tpu.config import VisualConfig
    from vloam_tpu.data.gridding import depth_buckets
    from vloam_tpu.models.frame_graph import kitti_default_extrinsics
    from vloam_tpu.ops.depth_map import build_buckets, project_cloud

    vc = VisualConfig()
    ext = kitti_default_extrinsics()
    proj = np.asarray(ext.P_rect0 @ ext.R_rect0 @ ext.cam_T_velo)
    pts = _scan(seed=5)
    padded, mask = synthetic.pad_cloud(pts, 65536)

    uvz, ok = project_cloud(jnp.array(padded), jnp.array(mask), jnp.array(proj), vc)
    dev = build_buckets(uvz, ok, vc)
    hu, hv, hz, hc = depth_buckets(padded, mask, proj, vc)

    np.testing.assert_allclose(np.asarray(dev.count), hc, atol=0)
    np.testing.assert_allclose(np.asarray(dev.u), hu, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dev.v), hv, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dev.z), hz, atol=2e-3)
