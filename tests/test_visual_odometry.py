"""Full VO stack on the synthetic blob world with raycast-consistent depth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu import geometry as geo
from vloam_tpu.config import kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.models.visual_odometry import init_vo_state, vo_step


@pytest.mark.slow
def test_vo_forward_motion():
    cfg = kitti_hdl64()
    vc = cfg.visual
    K = synthetic.kitti_like_intrinsics(vc.img_width, vc.img_height).astype(np.float64)
    proj = np.zeros((3, 4), np.float32)
    proj[:, :3] = K
    boxes = synthetic.default_scene()
    rng = np.random.default_rng(5)
    uv0 = np.stack(
        [rng.uniform(20, vc.img_width - 20, 1200), rng.uniform(20, vc.img_height - 20, 1200)], -1
    )
    R0c = synthetic.CAM_R_WORLD.T
    pc0, hit = synthetic.raycast_camera(R0c, np.zeros(3), boxes, K, uv0)
    blob_world = pc0[hit] @ R0c.T

    def cam_pose(i):
        yaw = 0.004 * i
        c, s = np.cos(yaw), np.sin(yaw)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]) @ R0c, np.array([0.6 * i, 0.01 * i, 0.0])

    state = init_vo_state(cfg)
    step = jax.jit(
        lambda s, img, cl, m: vo_step(s, img, cl, m, jnp.array(proj), jnp.array(K, jnp.float32), cfg)
    )
    for i in range(3):
        R_wc, tw = cam_pose(i)
        img = synthetic.render_blob_image((blob_world - tw) @ R_wc, K, vc.img_height, vc.img_width)
        cl = synthetic.camera_grid_cloud(R_wc, tw, boxes, K, vc.img_height, vc.img_width)
        cloud, cmask = synthetic.pad_cloud(cl, 65536)
        state, pose = step(state, jnp.array(img), jnp.array(cloud), jnp.array(cmask))
        if i > 0:
            Rp, tp = cam_pose(i - 1)
            t_rel = R_wc.T @ (tp - tw)
            R_rel = R_wc.T @ Rp
            est_t = np.asarray(pose[4:])
            est_R = np.asarray(geo.quat_to_matrix(pose[:4]))
            # rotation tight; translation direction within a few degrees;
            # scale within 15% (blob-soup texture mixes depths inside the
            # KLT window -> bounded scale bias; see test comments)
            assert np.abs(est_R - R_rel).max() < 2e-3
            cos = est_t @ t_rel / (np.linalg.norm(est_t) * np.linalg.norm(t_rel))
            assert cos > 0.995
            assert abs(np.linalg.norm(est_t) - np.linalg.norm(t_rel)) < 0.15 * np.linalg.norm(t_rel)


def test_vo_first_frame_identity():
    cfg = kitti_hdl64()
    vc = cfg.visual
    K = synthetic.kitti_like_intrinsics(vc.img_width, vc.img_height)
    proj = np.zeros((3, 4), np.float32)
    proj[:, :3] = K
    state = init_vo_state(cfg)
    img = jnp.zeros((vc.img_height, vc.img_width))
    cloud = jnp.zeros((1024, 3))
    state, pose = vo_step(
        state, img, cloud, jnp.zeros(1024, bool), jnp.array(proj), jnp.array(K, jnp.float32), cfg
    )
    np.testing.assert_allclose(np.asarray(pose), np.asarray(geo.pose_identity()), atol=1e-6)
