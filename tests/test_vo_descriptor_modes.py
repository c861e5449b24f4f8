"""vo_step with every DescriptorType/MatcherType family (the reference's
configurable frontend, image_util.h:27-46) — plumbing smoke test on a small
config: a static textured scene must yield (near-)identity f2f poses."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from vloam_tpu import geometry as geo
from vloam_tpu.config import kitti_hdl64
from vloam_tpu.models.visual_odometry import init_vo_state, vo_step


def _small_cfg(descriptor_type, matcher_type="bf", detector_type="shitomasi"):
    cfg = kitti_hdl64()
    vc = dataclasses.replace(
        cfg.visual,
        img_height=192, img_width=256, max_features=256, max_corners=256,
        optical_flow_match=False,
        detector_type=detector_type,
        descriptor_type=descriptor_type,
        matcher_type=matcher_type,
    )
    return dataclasses.replace(cfg, visual=vc)


def _texture(rng, H, W):
    img = rng.uniform(0, 1, (H // 8, W // 8))
    img = np.kron(img, np.ones((8, 8)))
    for _ in range(60):
        y, x = rng.integers(20, H - 20), rng.integers(20, W - 20)
        img[y - 3 : y + 3, x - 3 : x + 3] += rng.uniform(0.5, 1.0)
    return (img / img.max() * 255.0).astype(np.float32)


@pytest.mark.slow
@pytest.mark.parametrize(
    "desc,matcher,det",
    [
        ("orb", "bf", "shitomasi"),
        ("brief", "flann", "fast"),
        ("brisk", "bf", "brisk"),
        ("freak", "bf", "brisk"),
        ("akaze", "bf", "akaze"),
        ("sift", "flann", "sift"),
    ],
)
def test_static_scene_identity(desc, matcher, det, rng):
    cfg = _small_cfg(desc, matcher, det)
    vc = cfg.visual
    K = np.array([[200.0, 0, vc.img_width / 2], [0, 200.0, vc.img_height / 2], [0, 0, 1]],
                 np.float32)
    proj = np.zeros((3, 4), np.float32)
    proj[:, :3] = K
    img = jnp.array(_texture(rng, vc.img_height, vc.img_width))
    # flat wall of lidar points 10 m ahead covering the image
    uv = np.stack(np.meshgrid(np.arange(8, vc.img_width - 8, 4),
                              np.arange(8, vc.img_height - 8, 4)), -1).reshape(-1, 2)
    Xc = np.concatenate([uv, np.ones((len(uv), 1))], 1) @ np.linalg.inv(K).T * 10.0
    cloud, cmask = jnp.array(Xc, jnp.float32), jnp.ones((len(Xc),), bool)

    state = init_vo_state(cfg)
    for i in range(3):
        state, pose = vo_step(state, img, cloud, cmask,
                              jnp.array(proj), jnp.array(K), cfg)
    # static scene: identical frames => identity transform
    assert np.isfinite(np.asarray(pose)).all(), desc
    np.testing.assert_allclose(np.asarray(pose[4:]), 0.0, atol=5e-2)
    np.testing.assert_allclose(
        np.asarray(geo.quat_to_matrix(pose[:4])), np.eye(3), atol=5e-3
    )
