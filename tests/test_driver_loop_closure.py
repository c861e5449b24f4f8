"""Driver-level loop closure: detection -> registration -> pose-graph
refinement through VloamDriver (the --loop-closure CLI path), on a ring
course that returns to its start.  Covers runtime/driver._loop_factors,
which test_loop_closure.py's component-level test does not."""

import numpy as np
import pytest

from vloam_tpu.config import MappingConfig, ScanConfig, kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.models import frame_graph as fg
from vloam_tpu.runtime.driver import VloamDriver

CFG = kitti_hdl64().replace(
    scan=ScanConfig(ring_cap=512, max_points=32768, less_flat_cap=8192),
    mapping=MappingConfig(
        grid_w=7, grid_h=7, grid_d=3,
        corner_cube_cap=1024, surf_cube_cap=2048,
        corner_stack_cap=2048, surf_stack_cap=4096,
    ),
    verbose_level=0,
)


def _ring_scene(radius_course: float) -> np.ndarray:
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


@pytest.mark.slow
def test_driver_loop_closure_end_to_end():
    n = 56
    speed = 1.1
    yaw_rate = 2 * np.pi / n
    poses = synthetic.straight_trajectory(n, speed=speed, yaw_rate=yaw_rate)
    scene = _ring_scene(speed / yaw_rate)

    driver = VloamDriver(
        CFG, fg.kitti_default_extrinsics(),
        loop_closure=True, keyframe_every=5,
        loop_radius=6.0, loop_min_travel=25.0, loop_drift_rate=0.02,
        loop_min_gap=3,
    )
    mo = []
    for i, (R, t) in enumerate(poses):
        cloud = synthetic.simulate_scan(
            R, t, scene, n_azimuth=500, noise=0.01, seed=i
        )
        out = driver.process(None, cloud)
        mo.append(np.asarray(out.world_mo))
    mo = np.stack(mo)
    gt = np.stack([t for _, t in poses])
    raw_ate = float(np.mean(np.linalg.norm(mo[:, 4:] - gt, axis=1)))

    refined = driver.refine_trajectory()
    assert refined is not None and refined.shape == (n, 7)
    # the ring course returns to its start: the travel-gated detector must
    # fire on the driver's keyframe chain (this is the seam _loop_factors
    # owns: kf bookkeeping -> detection -> registration -> factors)
    factors = driver._loop_factors(mo)
    assert factors is not None, "no loop factor registered on a closed ring"
    assert int(np.asarray(factors.valid).sum()) >= 1

    ref_ate = float(np.mean(np.linalg.norm(refined[:, 4:] - gt, axis=1)))
    # clean synthetic drift is small; refinement must not damage the chain,
    # and the refined endpoint must close at least as well as raw
    assert ref_ate < max(1.5 * raw_ate, 0.25), (raw_ate, ref_ate)
    driver.close()
