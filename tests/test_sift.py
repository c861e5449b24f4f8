"""SIFT detector/descriptor (DetectorType::SIFT / DescriptorType::SIFT
parity, image_util.cpp:104-108,316-320) + float matchers."""

import numpy as np
import jax.numpy as jnp
import pytest

from vloam_tpu.ops import sift


def _texture(rng, H=192, W=256):
    """Smooth random blob texture with strong local structure."""
    img = rng.uniform(0, 1, (H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))
    # add blob corners
    for _ in range(60):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        img[y - 3 : y + 3, x - 3 : x + 3] += rng.uniform(0.5, 1.0)
    return (img / img.max() * 255.0).astype(np.float32)


def test_detect_finds_blobs(rng):
    img = _texture(rng)
    kp = sift.detect(jnp.array(img), max_keypoints=512)
    n = int(kp.mask.sum())
    assert n > 50
    pts = np.asarray(kp.pts)[np.asarray(kp.mask)]
    assert pts[:, 0].max() < img.shape[1] and pts[:, 1].max() < img.shape[0]
    assert (pts >= 0).all()


def test_translation_matching(rng):
    img0 = _texture(rng)
    shift = 6
    img1 = np.roll(img0, (0, shift), axis=(0, 1))
    kp0, d0 = sift.sift_features(jnp.array(img0), 512)
    kp1, d1 = sift.sift_features(jnp.array(img1), 512)
    idx, ok = sift.match_float_descriptors(d0, kp0.mask, d1, kp1.mask)
    ok = np.asarray(ok)
    assert ok.sum() >= 30
    p0 = np.asarray(kp0.pts)[ok]
    p1 = np.asarray(kp1.pts)[np.asarray(idx)[ok]]
    flow = p1 - p0
    # median flow recovers the shift (border keypoints wrap; median is robust)
    med = np.median(flow, axis=0)
    assert abs(med[0] - shift) < 1.0 and abs(med[1]) < 1.0


def test_rotation_invariance(rng):
    img0 = _texture(rng)
    img1 = np.rot90(img0).copy()          # 90 deg rotation
    kp0, d0 = sift.sift_features(jnp.array(img0), 512)
    kp1, d1 = sift.sift_features(jnp.array(img1), 512)
    idx, ok = sift.match_float_descriptors(d0, kp0.mask, d1, kp1.mask, ratio=0.75)
    ok = np.asarray(ok)
    assert ok.sum() >= 20
    H = img0.shape[0]
    p0 = np.asarray(kp0.pts)[ok]
    p1 = np.asarray(kp1.pts)[np.asarray(idx)[ok]]
    # np.rot90 maps (x, y) -> (y, H-1-x)... check the majority agree
    pred = np.stack([p0[:, 1], img0.shape[1] - 1 - p0[:, 0]], -1)
    err = np.linalg.norm(pred - p1, axis=1)
    assert np.median(err) < 3.0


def test_flann_equivalent_matches_exact(rng):
    img0 = _texture(rng)
    img1 = np.roll(img0, (0, 4), axis=(0, 1))
    kp0, d0 = sift.sift_features(jnp.array(img0), 256)
    kp1, d1 = sift.sift_features(jnp.array(img1), 256)
    i_ex, ok_ex = sift.match_float_descriptors(d0, kp0.mask, d1, kp1.mask)
    i_ap, ok_ap = sift.match_float_descriptors_approx(d0, kp0.mask, d1, kp1.mask)
    ok_ex, ok_ap = np.asarray(ok_ex), np.asarray(ok_ap)
    both = ok_ex & ok_ap
    assert both.sum() > 0.7 * max(ok_ex.sum(), 1)
    agree = (np.asarray(i_ex)[both] == np.asarray(i_ap)[both]).mean()
    assert agree > 0.9
