"""End-to-end scan-to-scan LO on the synthetic world: drift bounds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu.config import ScanConfig, kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.models.lidar_odometry import init_lo_state, lo_step
from vloam_tpu.ops.scan_registration import extract_features


@pytest.mark.slow
def test_lo_straight_line_drift():
    cfg = kitti_hdl64().replace(
        scan=ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=16384)
    )
    scene = synthetic.default_scene()
    n_frames, speed = 5, 0.8
    poses = synthetic.straight_trajectory(n_frames, speed=speed, yaw_rate=0.01)
    state = init_lo_state(cfg)
    step = jax.jit(lambda s, p, m: lo_step(s, extract_features(p, m, cfg.scan), cfg)[:3])
    world = None
    for i, (R, t) in enumerate(poses):
        pts = synthetic.simulate_scan(R, t, scene, n_azimuth=700, noise=0.005, seed=i)
        p, m = synthetic.pad_cloud(pts, cfg.scan.max_points)
        state, delta, world = step(state, jnp.array(p), jnp.array(m))
        if i >= 1:
            d = np.asarray(delta)
            # frame-to-frame translation ~ (speed, 0, 0) within 5 cm
            assert abs(d[4] - speed) < 0.05, d
            assert abs(d[5]) < 0.05 and abs(d[6]) < 0.05

    gt = poses[-1][1]
    est = np.asarray(world)[4:]
    err = np.linalg.norm(est - gt)
    path_len = speed * (n_frames - 1)
    assert err / path_len < 0.03, (est, gt)
