"""KITTI metric implementation sanity checks."""

import numpy as np

from vloam_tpu.utils.kitti_eval import ate, evaluate, trajectory_distances


def straight_traj(n, step=1.0, drift=0.0):
    out = np.tile(np.eye(4)[:3], (n, 1, 1))
    out[:, 0, 3] = np.arange(n) * step * (1.0 + drift)
    return out


def test_perfect_trajectory_zero_error():
    gt = straight_traj(300)
    res = evaluate(gt, gt)
    assert res["segments"] > 0
    assert res["trans_pct"] < 1e-9
    assert res["rot_deg_per_m"] < 1e-9


def test_known_scale_drift():
    gt = straight_traj(1000)
    est = straight_traj(1000, drift=0.02)  # 2% scale error
    res = evaluate(gt, est)
    np.testing.assert_allclose(res["trans_pct"], 2.0, rtol=0.05)


def test_distances():
    gt = straight_traj(11, step=2.0)
    d = trajectory_distances(np.concatenate([gt, np.tile([[0, 0, 0, 1]], (11, 1, 1))], axis=1))
    np.testing.assert_allclose(d[-1], 20.0)


def test_ate():
    gt = straight_traj(100)
    est = straight_traj(100)
    est[:, 1, 3] += 0.5
    np.testing.assert_allclose(ate(gt, est), 0.5, rtol=1e-6)
