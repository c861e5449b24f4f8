"""Loop closure on a synthetic loop course: detection, registration, and
drift actually closed by the pose graph (before/after ATE)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu import geometry as geo
from vloam_tpu.config import ScanConfig, kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.models.lidar_odometry import init_lo_state, lo_step
from vloam_tpu.ops.scan_registration import extract_features
from vloam_tpu.parallel.loop_closure import detect_revisits, loop_factors, register_loop
from vloam_tpu.parallel.pose_graph import concat_factors, odometry_factors, optimize_pose_graph

CFG = kitti_hdl64().replace(
    scan=ScanConfig(ring_cap=512, max_points=32768, less_flat_cap=8192)
)


def _ring_scene(radius_course: float) -> np.ndarray:
    """Boxes + poles ringing a circular course (center (0, r_course))."""
    rng = np.random.default_rng(5)
    cx, cy = 0.0, radius_course
    boxes = []
    for i in range(16):
        a = i * 2 * np.pi / 16
        r = radius_course + 14.0 + rng.uniform(-2, 2)
        x, y = cx + r * np.cos(a), cy + r * np.sin(a)
        w, d, h = rng.uniform(4, 8), rng.uniform(4, 8), rng.uniform(5, 12)
        boxes.append([x, y, -1.7, x + w, y + d, -1.7 + h])
    for i in range(20):
        a = (i + 0.5) * 2 * np.pi / 20
        r = radius_course + 8.0 + rng.uniform(-1, 1)
        x, y = cx + r * np.cos(a), cy + r * np.sin(a)
        boxes.append([x, y, -1.7, x + 0.3, y + 0.3, 3.0])
    return np.array(boxes, np.float64)


def test_detect_revisits_gates():
    # straight line: no revisit
    pos = np.stack([np.arange(50.0), np.zeros(50), np.zeros(50)], -1)
    assert detect_revisits(pos, min_gap=10, radius=3.0) == []
    # return to start after 40 keyframes: exactly one candidate, (0-ish, ~40)
    loop = np.concatenate([pos[:40], pos[:5][::-1]])
    pairs = detect_revisits(loop, min_gap=20, radius=1.5)
    assert len(pairs) >= 1
    j, k = pairs[0]
    assert k - j >= 20 and np.linalg.norm(loop[k] - loop[j]) < 1.5


def test_detect_revisits_travel_gate():
    """Stopped segment: keyframes far apart in INDEX but ~0 m apart in PATH
    must not register as revisits (they are the same place, not a loop)."""
    # drive 10 m, then sit still for 30 keyframes
    moving = np.stack([np.arange(10.0), np.zeros(10), np.zeros(10)], -1)
    stopped = np.repeat(moving[-1:], 30, axis=0) + np.random.default_rng(0).normal(
        scale=0.05, size=(30, 3)
    )
    pos = np.concatenate([moving, stopped])
    # index-gap-only gate fires spuriously on the parked segment...
    assert detect_revisits(pos, min_gap=5, radius=3.0, min_spacing=2) != []
    # ...the travel gate does not
    assert detect_revisits(
        pos, min_gap=5, radius=3.0, min_spacing=2, min_travel=15.0
    ) == []


def test_detect_revisits_drift_scaled_radius():
    """A true revisit whose estimate has drifted past the fixed gate is
    still detected when the gate grows with traveled path."""
    n = 80
    th = np.linspace(0, 2 * np.pi, n)
    r = 100.0
    circle = np.stack([r * np.sin(th), r * (1 - np.cos(th)), np.zeros(n)], -1)
    # simulated 2% drift: the endpoint lands 12 m from the start
    drift = np.linspace(0, 1, n)[:, None] ** 2 * np.array([8.0, 9.0, 0.0])
    est = circle + drift
    fixed = detect_revisits(est, min_gap=40, radius=6.0, min_spacing=5,
                            min_travel=100.0)
    scaled = detect_revisits(est, min_gap=40, radius=6.0, min_spacing=5,
                             min_travel=100.0, drift_rate=0.02)
    assert fixed == []            # 12 m gap > 6 m fixed gate: missed
    assert scaled != []           # 6 + 0.02*~600 m of path covers the drift
    j, k = scaled[-1]
    assert j <= 5 and k >= n - 10, (j, k)


@pytest.mark.slow
def test_loop_closure_closes_drift_on_loop_course():
    n = 56
    speed = 1.1
    yaw_rate = 2 * np.pi / n
    radius_course = speed / yaw_rate
    poses_gt = synthetic.straight_trajectory(n, speed=speed, yaw_rate=yaw_rate)
    scene = _ring_scene(radius_course)

    # --- LO around the course, with an injected systematic yaw bias -------
    # (the drift source; real LO on this clean synthetic course drifts only
    # centimetres, too little to demonstrate closure)
    bias = geo.pose_from_qt(
        geo.angle_axis_to_quat(jnp.array([0.0, 0.0, 0.004], jnp.float32)),
        jnp.zeros(3, jnp.float32),
    )
    state = init_lo_state(CFG)
    step = jax.jit(lambda s, p, m: lo_step(s, extract_features(p, m, CFG.scan), CFG)[:2])
    feats_fn = jax.jit(lambda p, m: extract_features(p, m, CFG.scan))

    keyframes = {}
    deltas = []
    world = geo.pose_identity()
    worlds = [np.asarray(world)]
    for i, (R, t) in enumerate(poses_gt):
        pts = synthetic.simulate_scan(R, t, scene, n_azimuth=500, noise=0.004, seed=i)
        p, m = synthetic.pad_cloud(pts, CFG.scan.max_points)
        if i in (0, n - 1):
            keyframes[i] = feats_fn(jnp.array(p), jnp.array(m))
        state, delta = step(state, jnp.array(p), jnp.array(m))
        if i >= 1:
            d_biased = geo.pose_compose(delta, bias)
            deltas.append(np.asarray(d_biased))
            world = geo.pose_compose(world, d_biased)
            worlds.append(np.asarray(world))

    worlds = np.stack(worlds)                       # (n, 7) drifted chain
    gt_pos = np.stack([t for _, t in poses_gt])
    ate_before = float(np.mean(np.linalg.norm(worlds[:, 4:] - gt_pos, axis=1)))
    end_err_before = float(np.linalg.norm(worlds[-1, 4:] - gt_pos[-1]))
    assert end_err_before > 1.0, "drift injection should open the loop visibly"

    # --- detect + register + optimize -------------------------------------
    pairs = detect_revisits(worlds[:, 4:], min_gap=20, radius=6.0)
    assert pairs, "course returns to start; the proximity gate must fire"
    j, k = pairs[-1]
    assert j <= 2 and k >= n - 3, (j, k)

    rel_init = geo.pose_compose(
        geo.pose_inverse(jnp.array(worlds[j])), jnp.array(worlds[k])
    )
    z, n_corr, accepted = register_loop(
        keyframes[0], keyframes[n - 1], rel_init, CFG
    )
    assert accepted, (n_corr, z)

    factors = concat_factors(
        odometry_factors(jnp.array(np.stack(deltas), jnp.float32), weight=1.0),
        loop_factors([(j, k)], [z], weight=25.0),
    )
    refined = np.asarray(
        optimize_pose_graph(jnp.array(worlds, jnp.float32), factors, iters=15)
    )

    ate_after = float(np.mean(np.linalg.norm(refined[:, 4:] - gt_pos, axis=1)))

    def loop_gap(chain):
        rel = geo.pose_compose(
            geo.pose_inverse(jnp.array(chain[j])), jnp.array(chain[k])
        )
        return float(np.linalg.norm(np.asarray(rel)[4:] - z[4:]))

    gap_before, gap_after = loop_gap(worlds), loop_gap(refined)
    print(
        f"\nATE before={ate_before:.3f} after={ate_after:.3f} m; "
        f"loop gap {gap_before:.3f} -> {gap_after:.3f} m; "
        f"loop ({j},{k}) corr={n_corr}"
    )
    # the pose graph halves the absolute trajectory error (one loop factor
    # cannot recover ground truth — the systematic bias deforms the course
    # shape between the loop's endpoints, and pose 0 fixes the gauge)...
    assert ate_after < 0.5 * ate_before, (ate_before, ate_after)
    # ...and the loop itself CLOSES: the optimized chain satisfies the
    # registered relative pose to centimetres where the drifted chain was
    # metres out.
    assert gap_before > 1.0 and gap_after < 0.1 * gap_before, (gap_before, gap_after)
