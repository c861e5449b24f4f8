"""Headless debug visualizations (utils/visualize.py)."""

import numpy as np

from vloam_tpu.utils import visualize as viz


def test_draw_keypoints_marks_points():
    img = np.zeros((40, 60), np.float32)
    pts = np.array([[10.0, 5.0], [50.0, 30.0]])
    mask = np.array([True, False])
    rgb = viz.draw_keypoints(img, pts, mask)
    assert rgb.shape == (40, 60, 3)
    assert tuple(rgb[5, 10]) == (0, 255, 0)
    assert tuple(rgb[30, 50]) == (0, 0, 0)      # masked-out point untouched


def test_draw_flow_and_matches_shapes():
    img = np.full((32, 48), 100.0, np.float32)
    p0 = np.array([[5.0, 5.0], [20.0, 10.0]])
    p1 = p0 + np.array([3.0, 2.0])
    ok = np.array([True, True])
    fl = viz.draw_flow(img, p0, p1, ok)
    assert fl.shape == (32, 48, 3)
    assert tuple(fl[7, 8]) == (255, 0, 0)       # arrow tip at p1
    mt = viz.draw_matches(img, img, p0, p1, ok)
    assert mt.shape == (32, 96, 3)


def test_depth_colormap_endpoints():
    cols = viz.depth_colormap(np.array([1.0, 60.0]), z_min=1.0, z_max=60.0)
    assert cols[0, 0] > 200 and cols[0, 2] == 0     # near -> red
    assert cols[1, 2] > 200 and cols[1, 0] == 0     # far -> blue


def test_draw_depth_and_save(tmp_path):
    img = np.zeros((20, 30), np.float32)
    uv = np.array([[4.0, 6.0], [25.0, 15.0]])
    z = np.array([2.0, 55.0])
    ok = np.array([True, True])
    rgb = viz.draw_depth(img, uv, z, ok)
    assert (rgb[6, 4] != 0).any() and (rgb[15, 25] != 0).any()
    p = tmp_path / "d.png"
    viz.save_png(str(p), rgb)
    assert p.exists()
