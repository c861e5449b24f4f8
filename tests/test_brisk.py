"""BRISK detector/descriptor + FREAK descriptor (DetectorType::BRISK,
DescriptorType::BRISK/FREAK parity, image_util.cpp:88-92,296-299,311-315)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vloam_tpu.ops import brisk
from vloam_tpu.ops.orb import match_descriptors


def _texture(rng, H=192, W=256):
    img = rng.uniform(0, 1, (H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))
    for _ in range(80):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        img[y - 3 : y + 3, x - 3 : x + 3] += rng.uniform(0.5, 1.0)
    return (img / img.max() * 255.0).astype(np.float32)


def test_brisk_detect(rng):
    img = _texture(rng)
    kp = brisk.brisk_detect(jnp.array(img), 512)
    n = int(kp.mask.sum())
    assert n > 60
    pts = np.asarray(kp.pts)[np.asarray(kp.mask)]
    assert (pts >= 0).all()
    assert pts[:, 0].max() < img.shape[1] and pts[:, 1].max() < img.shape[0]
    # multiple octaves represented
    assert len(np.unique(np.asarray(kp.octave)[np.asarray(kp.mask)])) >= 2


def _match_translation(rng, describe_fn, shift=6, min_matches=25):
    img0 = _texture(rng)
    img1 = np.roll(img0, (0, shift), axis=(0, 1))
    kp0 = brisk.brisk_detect(jnp.array(img0), 512)
    kp1 = brisk.brisk_detect(jnp.array(img1), 512)
    d0, m0 = describe_fn(jnp.array(img0), kp0)
    d1, m1 = describe_fn(jnp.array(img1), kp1)
    idx, ok = match_descriptors(d0, m0, d1, m1, ratio=0.8)
    ok = np.asarray(ok)
    assert ok.sum() >= min_matches
    p0 = np.asarray(kp0.pts)[ok]
    p1 = np.asarray(kp1.pts)[np.asarray(idx)[ok]]
    med = np.median(p1 - p0, axis=0)
    assert abs(med[0] - shift) < 1.5 and abs(med[1]) < 1.5


@pytest.mark.slow
def test_brisk_descriptor_matching(rng):
    _match_translation(rng, brisk.brisk_descriptors)


def test_freak_descriptor_matching(rng):
    _match_translation(rng, brisk.freak_descriptors)


def test_brisk_rotation_tolerance(rng):
    """Orientation normalisation keeps matches under a 90-degree rotation."""
    img0 = _texture(rng)
    img1 = np.rot90(img0).copy()
    kp0 = brisk.brisk_detect(jnp.array(img0), 512)
    kp1 = brisk.brisk_detect(jnp.array(img1), 512)
    d0, m0 = brisk.brisk_descriptors(jnp.array(img0), kp0)
    d1, m1 = brisk.brisk_descriptors(jnp.array(img1), kp1)
    idx, ok = match_descriptors(d0, m0, d1, m1, ratio=0.75)
    ok = np.asarray(ok)
    assert ok.sum() >= 10
    p0 = np.asarray(kp0.pts)[ok]
    p1 = np.asarray(kp1.pts)[np.asarray(idx)[ok]]
    pred = np.stack([p0[:, 1], img0.shape[1] - 1 - p0[:, 0]], -1)
    err = np.linalg.norm(pred - p1, axis=1)
    assert np.median(err) < 4.0
