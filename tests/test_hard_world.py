"""The stressor world (bench._gen_frames hard=True) actually stresses:
dynamic boxes appear in the scans, the textureless window blanks the
camera, and ground truth is untouched."""

import numpy as np

from vloam_tpu.config import kitti_hdl64
from vloam_tpu.models import frame_graph as fg


def test_hard_world_stressors_present():
    from bench import _gen_frames

    # full production ScanConfig: ring caps must be wide enough that the
    # adjacent-lane vehicle's azimuth sector survives gridding
    cfg = kitti_hdl64()
    ext = fg.kitti_default_extrinsics()
    n = 26          # textureless window = [n//3, n//3 + 12) = [8, 20)
    # yaw_rate=0 so the sensor frame stays axis-aligned with the world and
    # the box-containment check below needs no rotation
    frames, poses = _gen_frames(cfg, ext, n_frames=n, speed=0.9, yaw_rate=0.0,
                                hard=True)

    # textureless stretch renders nothing
    def nonzero(img):
        return float((np.asarray(img) > 0).mean())

    assert nonzero(frames[7][0]) > 0.0
    assert nonzero(frames[8][0]) == 0.0
    assert nonzero(frames[19][0]) == 0.0
    assert nonzero(frames[20][0]) > 0.0

    # the oncoming vehicle adds returns the easy world lacks: frame 20's
    # scan must contain points in the adjacent-lane vehicle's box
    # (x_on - ego = 90 - 3.7*20 = 16 m ahead, y in [-5.2, -2.8])
    g, m = np.asarray(frames[20][1]), np.asarray(frames[20][2])
    rel = g.reshape(-1, 4)[m.reshape(-1)][:, :3]   # sensor frame = ego-relative
    in_box = (
        (rel[:, 0] > 15.0) & (rel[:, 0] < 21.0)
        & (rel[:, 1] > -5.3) & (rel[:, 1] < -2.7)
        & (rel[:, 2] > -1.8) & (rel[:, 2] < 0.5)
    )
    assert in_box.sum() > 50, in_box.sum()

    # ground truth untouched by the stressors
    assert np.allclose(poses[5][1], [4.5, 0.0, 0.0])
