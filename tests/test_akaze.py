"""AKAZE nonlinear scale space + M-LDB descriptor (DetectorType::AKAZE /
DescriptorType::AKAZE parity, image_util.cpp:98-102,306-310)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vloam_tpu.ops import akaze
from vloam_tpu.ops.orb import match_descriptors


def _texture(rng, H=192, W=256):
    img = rng.uniform(0, 1, (H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))
    for _ in range(80):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        img[y - 3 : y + 3, x - 3 : x + 3] += rng.uniform(0.5, 1.0)
    return (img / img.max() * 255.0).astype(np.float32)


def test_diffusion_preserves_edges(rng):
    """Perona-Malik smooths flat regions but keeps strong edges sharper
    than a Gaussian of equal support."""
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 200.0
    img += rng.normal(0, 4, img.shape).astype(np.float32)
    octs = akaze.nonlinear_scale_space(jnp.array(img))
    out = np.asarray(octs[0][-1])
    # noise in flat regions attenuated
    assert out[10:50, 5:25].std() < img[10:50, 5:25].std() * 0.7
    # edge magnitude preserved
    edge = np.abs(out[:, 33] - out[:, 30]).mean()
    assert edge > 120.0


@pytest.mark.slow
def test_akaze_detect(rng):
    img = _texture(rng)
    kp = akaze.detect(jnp.array(img), 512)
    n = int(kp.mask.sum())
    assert n > 40
    pts = np.asarray(kp.pts)[np.asarray(kp.mask)]
    assert (pts >= 0).all()
    assert pts[:, 0].max() < img.shape[1] and pts[:, 1].max() < img.shape[0]


def test_akaze_matching_translation(rng):
    img0 = _texture(rng)
    shift = 6
    img1 = np.roll(img0, (0, shift), axis=(0, 1))
    kp0, d0, m0 = akaze.akaze_features(jnp.array(img0), 512)
    kp1, d1, m1 = akaze.akaze_features(jnp.array(img1), 512)
    idx, ok = match_descriptors(d0, m0, d1, m1, ratio=0.8)
    ok = np.asarray(ok)
    assert ok.sum() >= 20
    p0 = np.asarray(kp0.pts)[ok]
    p1 = np.asarray(kp1.pts)[np.asarray(idx)[ok]]
    med = np.median(p1 - p0, axis=0)
    assert abs(med[0] - shift) < 1.5 and abs(med[1]) < 1.5
