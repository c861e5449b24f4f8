"""Native host runtime: .bin/.png loaders + async prefetcher vs NumPy oracles."""

import os
import struct

import numpy as np
import pytest

from vloam_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (native/build.sh)"
)


@pytest.fixture
def bin_files(tmp_path, rng):
    paths, arrays = [], []
    for i in range(5):
        pts = rng.normal(size=(100 + 17 * i, 4)).astype(np.float32)
        p = tmp_path / f"{i:06d}.bin"
        pts.tofile(p)
        paths.append(str(p))
        arrays.append(pts[:, :3])
    return paths, arrays


def test_load_bin_matches_numpy(bin_files):
    paths, arrays = bin_files
    out, n = native.load_bin(paths[0], 4096)
    assert n == len(arrays[0])
    np.testing.assert_allclose(out[:n], arrays[0])
    assert (out[n:] == 0).all()


def test_load_bin_truncates(bin_files):
    paths, arrays = bin_files
    out, n = native.load_bin(paths[1], 50)
    assert n == 50
    np.testing.assert_allclose(out, arrays[1][:50])


def test_load_png_gray(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 255, size=(60, 80), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img, "L").save(p)
    out = native.load_png_gray(str(p), 64, 96)  # padded target
    np.testing.assert_allclose(out[:60, :80], img.astype(np.float32))
    assert (out[60:, :] == 0).all() and (out[:, 80:] == 0).all()


def test_prefetcher_ordered_stream(bin_files, tmp_path, rng):
    from PIL import Image

    paths, arrays = bin_files
    img_paths = []
    imgs = []
    for i in range(5):
        img = rng.integers(0, 255, size=(40, 50), dtype=np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(img, "L").save(p)
        img_paths.append(str(p))
        imgs.append(img)

    pf = native.NativePrefetcher(paths, img_paths, max_points=512, height=40, width=50, depth=2)
    assert len(pf) == 5
    for i, (cloud, n, img) in enumerate(pf):
        assert n == len(arrays[i])
        np.testing.assert_allclose(cloud[:n], arrays[i])
        np.testing.assert_allclose(img, imgs[i].astype(np.float32))
    pf.close()


def test_prefetcher_lidar_only(bin_files):
    paths, arrays = bin_files
    pf = native.NativePrefetcher(paths, None, max_points=512)
    seen = 0
    for i, (cloud, n, img) in enumerate(pf):
        assert img is None
        np.testing.assert_allclose(cloud[:n], arrays[i])
        seen += 1
    assert seen == 5
    pf.close()


def _lidar_scan(seed=0):
    from vloam_tpu.data import synthetic

    boxes = synthetic.default_scene()
    return synthetic.simulate_scan(np.eye(3), np.zeros(3), boxes, n_azimuth=600, noise=0.01, seed=seed)


def test_grid_cloud_matches_python():
    from vloam_tpu.config import ScanConfig
    from vloam_tpu.data.gridding import grid_cloud

    cfg = ScanConfig(ring_cap=512, max_points=32768, less_flat_cap=8192)
    pts = _lidar_scan().astype(np.float32)
    g_py, m_py, n_py = grid_cloud(pts, cfg)
    g_c, m_c, n_c = native.grid_cloud_native(pts, cfg)
    np.testing.assert_array_equal(m_py, m_c)
    np.testing.assert_array_equal(n_py, n_c)
    np.testing.assert_allclose(g_py, g_c, atol=1e-5)


def test_prefetcher_grid_mode(tmp_path):
    from vloam_tpu.config import ScanConfig
    from vloam_tpu.data.gridding import grid_cloud

    cfg = ScanConfig(ring_cap=512, max_points=65536, less_flat_cap=8192)
    paths, grids = [], []
    for i in range(4):
        pts = _lidar_scan(seed=i).astype(np.float32)
        xyzr = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        p = tmp_path / f"{i:06d}.bin"
        xyzr.tofile(p)
        paths.append(str(p))
        grids.append(grid_cloud(pts, cfg))

    pf = native.NativePrefetcher(paths, None, max_points=cfg.max_points, scan_cfg=cfg)
    for i, (grid, gmask, npr, img) in enumerate(pf.iter_grids()):
        g_py, m_py, n_py = grids[i]
        assert img is None
        np.testing.assert_array_equal(gmask, m_py)
        np.testing.assert_array_equal(npr, n_py)
        np.testing.assert_allclose(grid, g_py, atol=1e-5)
    pf.close()


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_depth_buckets_match_numpy():
    from vloam_tpu.config import VisualConfig
    from vloam_tpu.data.gridding import depth_buckets
    from vloam_tpu.models.frame_graph import kitti_default_extrinsics

    vc = VisualConfig()
    ext = kitti_default_extrinsics()
    proj = np.asarray(ext.P_rect0 @ ext.R_rect0 @ ext.cam_T_velo, np.float32)
    rng = np.random.default_rng(4)
    pts = rng.normal(0, 25, (20000, 3)).astype(np.float32)
    mask = rng.random(20000) < 0.8

    nu, nv, nz, nc = native.depth_buckets_native(pts, mask, proj, vc)
    pu, pv, pz, pc = depth_buckets(pts, mask, proj, vc)

    np.testing.assert_array_equal(nc, pc)
    np.testing.assert_allclose(nu, pu, atol=2e-3)
    np.testing.assert_allclose(nv, pv, atol=2e-3)
    np.testing.assert_allclose(nz, pz, atol=2e-3)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_lf_voxel_table_matches_numpy():
    from vloam_tpu.config import ScanConfig
    from vloam_tpu.data import synthetic
    from vloam_tpu.data.gridding import grid_cloud, less_flat_voxel_table

    cfg = ScanConfig(ring_cap=512, max_points=32768, less_flat_cap=8192)
    pts = synthetic.simulate_scan(
        np.eye(3), np.zeros(3), synthetic.default_scene(), n_azimuth=600, seed=2
    )
    g, m, _ = grid_cloud(pts, cfg)

    ns, nb, nn = native.lf_voxel_table_native(g, m, cfg)
    ps, pb, pn = less_flat_voxel_table(g, m, cfg)

    assert nn == pn
    np.testing.assert_array_equal(ns, ps)
    np.testing.assert_allclose(nb, pb, rtol=1e-5, atol=1e-4)
