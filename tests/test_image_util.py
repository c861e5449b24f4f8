"""ImageUtil facade: the reference's full DetectorType x DescriptorType x
MatcherType x SelectType surface (image_util.h:16-46) through one dispatch."""

import numpy as np
import jax.numpy as jnp
import pytest

from vloam_tpu import image_util as iu
from vloam_tpu.config import kitti_hdl64


def _texture(rng, H=192, W=256):
    img = rng.uniform(0, 1, (H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))
    for _ in range(80):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        img[y - 3 : y + 3, x - 3 : x + 3] += rng.uniform(0.5, 1.0)
    return (img / img.max() * 255.0).astype(np.float32)


@pytest.mark.parametrize("det", iu.DETECTOR_TYPES)
def test_every_detector(det, rng):
    cfg = kitti_hdl64().visual
    img = jnp.array(_texture(rng))
    kp = iu.det_keypoints(img, det, cfg)
    assert kp.pts.shape == (cfg.max_corners, 2)
    assert int(kp.mask.sum()) > 30, det


@pytest.mark.parametrize("desc", iu.DESCRIPTOR_TYPES)
def test_every_descriptor_matches_translation(desc, rng):
    cfg = kitti_hdl64().visual
    img0 = _texture(rng)
    img1 = np.roll(img0, (0, 5), axis=(0, 1))
    # pick the natural detector family for each descriptor
    det = {"brisk": "brisk", "freak": "brisk", "akaze": "akaze",
           "sift": "sift", "orb": "shitomasi", "brief": "shitomasi"}[desc]
    kp0 = iu.det_keypoints(jnp.array(img0), det, cfg)
    kp1 = iu.det_keypoints(jnp.array(img1), det, cfg)
    d0, m0 = iu.desc_keypoints(jnp.array(img0), kp0, desc, cfg)
    d1, m1 = iu.desc_keypoints(jnp.array(img1), kp1, desc, cfg)
    idx, ok = iu.match(d0, m0, d1, m1)
    ok = np.asarray(ok)
    assert ok.sum() >= 15, desc
    p0 = np.asarray(kp0.pts)[ok]
    p1 = np.asarray(kp1.pts)[np.asarray(idx)[ok]]
    med = np.median(p1 - p0, axis=0)
    assert abs(med[0] - 5) < 1.5 and abs(med[1]) < 1.5, desc


@pytest.mark.parametrize("matcher,select", [("bf", "nn"), ("bf", "knn"), ("flann", "knn")])
def test_matcher_modes(matcher, select, rng):
    cfg = kitti_hdl64().visual
    img0 = _texture(rng)
    img1 = np.roll(img0, (0, 4), axis=(0, 1))
    kp0 = iu.det_keypoints(jnp.array(img0), "shitomasi", cfg)
    kp1 = iu.det_keypoints(jnp.array(img1), "shitomasi", cfg)
    d0, m0 = iu.desc_keypoints(jnp.array(img0), kp0, "orb", cfg)
    d1, m1 = iu.desc_keypoints(jnp.array(img1), kp1, "orb", cfg)
    idx, ok = iu.match(d0, m0, d1, m1, matcher_type=matcher, select=select)
    ok = np.asarray(ok)
    assert ok.sum() >= 20
    p0 = np.asarray(kp0.pts)[ok]
    p1 = np.asarray(kp1.pts)[np.asarray(idx)[ok]]
    med = np.median(p1 - p0, axis=0)
    assert abs(med[0] - 4) < 1.5 and abs(med[1]) < 1.5


def test_nms_and_flow(rng):
    import dataclasses

    cfg = dataclasses.replace(kitti_hdl64().visual, keypoint_nms=True)
    img0 = _texture(rng)
    img1 = np.roll(img0, (0, 3), axis=(0, 1))
    kp = iu.det_keypoints(jnp.array(img0), "shitomasi", cfg)
    kp = iu.key_points_nms(kp, cfg)
    assert int(kp.mask.sum()) > 10
    curr, ok = iu.calculate_optical_flow(jnp.array(img0), jnp.array(img1), kp, cfg)
    ok = np.asarray(ok) & np.asarray(kp.mask)
    flow = np.asarray(curr)[ok] - np.asarray(kp.pts)[ok]
    assert ok.sum() > 10
    assert abs(np.median(flow[:, 0]) - 3) < 0.5
