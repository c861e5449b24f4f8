"""coarse_align recovers large SE(2) offsets between keyframe scans —
the global stage that puts drifted loop registrations back inside the GN
association basin (parallel/loop_closure.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vloam_tpu import geometry as geo
from vloam_tpu.ops.scan_registration import ScanFeatures
from vloam_tpu.parallel.loop_closure import coarse_align


def _world_points(seed=0, n=4000):
    """Structured, yaw-asymmetric world: clusters of points on rings of
    'buildings' around the origin plus a few dense blobs."""
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(14):
        a = i * 2 * np.pi / 14 + 0.25 * np.sin(i * 1.7)
        r = 30.0 + 12.0 * np.sin(i * 2.3)
        c = np.array([r * np.cos(a), r * np.sin(a), 1.0])
        k = n // 14
        pts.append(c + rng.normal(0, [2.0, 2.0, 1.0], (k, 3)))
    return np.concatenate(pts)


def _feats_at(world, R, t, cap=8192):
    local = (world - t) @ R          # R columns = sensor axes: p_sensor = R^T (w - t)
    pts = np.zeros((cap, 4), np.float32)
    msk = np.zeros((cap,), bool)
    m = min(len(local), cap)
    pts[:m, :3] = local[:m]
    msk[:m] = True
    z4 = np.zeros((16, 4), np.float32)
    zm = np.zeros((16,), bool)
    return ScanFeatures(
        sharp=jnp.array(z4), sharp_mask=jnp.array(zm),
        less_sharp=jnp.array(z4), less_sharp_mask=jnp.array(zm),
        flat=jnp.array(z4), flat_mask=jnp.array(zm),
        less_flat=jnp.array(pts), less_flat_mask=jnp.array(msk),
    )


@pytest.mark.slow
def test_register_loop_recovers_from_drifted_seed():
    """register_loop with a chain estimate 40+ m off (far outside the GN
    association basin): the coarse seed must win and recover the true
    relative pose to centimetres — the loop_drive mechanism, pinned."""
    import jax.numpy as jnp

    from vloam_tpu.config import ScanConfig, kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.ops.scan_registration import extract_features
    from vloam_tpu.parallel.loop_closure import register_loop
    from tests.test_loop_closure import _ring_scene

    cfg = kitti_hdl64().replace(
        scan=ScanConfig(ring_cap=512, max_points=32768, less_flat_cap=8192)
    )
    scene = _ring_scene(10.0)
    feats = []
    for t in [np.zeros(3), np.array([2.0, 2.0, 0.0])]:
        pts = synthetic.simulate_scan(
            np.eye(3), t, scene, n_azimuth=700, noise=0.005, seed=int(t[0])
        )
        p, m = synthetic.pad_cloud(pts, cfg.scan.max_points)
        feats.append(extract_features(jnp.array(p), jnp.array(m), cfg.scan))

    drifted = geo.pose_from_qt(
        jnp.array([0, 0, 0, 1.0], jnp.float32),
        jnp.array([38.0, -14.0, 0.0], jnp.float32),
    )
    z, n_tight, ok = register_loop(feats[0], feats[1], drifted, cfg)
    assert ok and n_tight > 300, (ok, n_tight)
    assert np.linalg.norm(z[4:] - np.array([2.0, 2.0, 0.0])) < 0.1, z[4:]


@pytest.mark.parametrize("yaw,dx,dy", [
    (0.0, 16.0, -8.0),          # pure translation, well outside the GN basin
    (0.45, -12.0, 20.0),        # yaw + translation
    (2.6, 30.0, 5.0),           # large yaw, large offset
])
def test_coarse_align_recovers_se2_offset(yaw, dx, dy):
    world = _world_points()

    def rot(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    R_j, t_j = rot(0.1), np.array([2.0, -1.0, 0.0])
    R_k = R_j @ rot(yaw)
    t_k = t_j + R_j @ np.array([dx, dy, 0.0])

    fj = _feats_at(world, R_j, t_j)
    fk = _feats_at(world, R_k, t_k)
    pose = np.asarray(coarse_align(fj, fk))

    # ground truth j_T_k
    R_jk = R_j.T @ R_k
    t_jk = R_j.T @ (t_k - t_j)
    yaw_est = 2.0 * np.arctan2(pose[2], pose[3])
    yaw_gt = np.arctan2(R_jk[1, 0], R_jk[0, 0])
    dyaw = np.arctan2(np.sin(yaw_est - yaw_gt), np.cos(yaw_est - yaw_gt))
    assert abs(dyaw) < 2 * np.pi / 128 + 0.02, (yaw_est, yaw_gt)
    # translation to within the 4 m cell resolution (plus yaw-snap skew)
    assert np.linalg.norm(pose[4:6] - t_jk[:2]) < 4.5, (pose[4:6], t_jk)
