"""The coupling (C)/(D) switch has measured, reference-shaped consequences.

Small-scale versions of tools/coupling_scenarios.py (full-scale numbers in
VALIDATION_r04.json "coupling_scenarios"):

* corridor (lidar-degenerate): coupled (C) must make real forward progress
  while decoupled (D) stays parked — the VO seed supplies the translation
  component LO cannot observe (laser_odometry.cpp:237-250 seed path).
* highway (lead vehicle + sparse structure): decoupled must track to a few
  percent while coupled collapses toward the truck-relative frame — the
  reference's seq-01 signature (BASELINE.md Table-I: C 45.36 % vs D 2.72 %).
"""

import numpy as np
import pytest

from vloam_tpu.config import MappingConfig, ScanConfig, kitti_hdl64
from vloam_tpu.data import scenarios as sc
from vloam_tpu.data import synthetic

CFG = kitti_hdl64().replace(
    scan=ScanConfig(ring_cap=512, max_points=32768, less_flat_cap=8192),
    mapping=MappingConfig(
        grid_w=7, grid_h=7, grid_d=3,
        corner_cube_cap=1024, surf_cube_cap=2048,
        corner_stack_cap=2048, surf_stack_cap=4096,
    ),
)


@pytest.mark.slow
def test_corridor_coupled_rescues_degenerate_lo():
    n, speed = 24, 0.9
    length = n * speed + 40.0
    walls = sc.corridor_scene(length)
    tex = sc.corridor_texture(length)
    poses = synthetic.straight_trajectory(n, speed=speed)
    res = sc.compare_modes(
        CFG, poses, lambda i: walls, lambda i: tex, n_azimuth=700
    )
    d, c = res["decoupled_D"], res["coupled_C"]
    # decoupled LO never observes forward motion: it stays parked
    assert d["x_progress_ratio"] < 0.15, d
    # the VO seed carries the coupled chain most of the way down the corridor
    assert c["x_progress_ratio"] > 0.45, c
    assert c["vo_x_progress_ratio"] > 0.85, c
    assert c["final_err_m"] < 0.7 * d["final_err_m"], (c, d)


@pytest.mark.slow
def test_highway_coupled_degrades_decoupled_robust():
    n = 40
    speeds = sc.highway_speeds(n)
    poses = sc.straight_poses_from_speeds(speeds)
    length = float(np.sum(speeds)) + 60.0
    static = sc.highway_static_scene(length)
    static_tex = sc.highway_static_texture(length)

    def boxes_fn(i):
        return np.concatenate([static, sc.truck_box(poses[i][1][0] + 14.0)])

    def texture_fn(i):
        return np.concatenate(
            [sc.truck_texture(poses[i][1][0] + 14.0), static_tex]
        )

    res = sc.compare_modes(CFG, poses, boxes_fn, texture_fn, n_azimuth=700)
    d, c = res["decoupled_D"], res["coupled_C"]
    # decoupled: the constant-velocity warm start keeps the static world as
    # the Huber inlier set — a few percent error
    assert d["final_err_pct"] < 8.0, d
    assert d["x_progress_ratio"] > 0.85, d
    # coupled: the truck-locked VO seed selects the wrong basin
    assert c["final_err_pct"] > 4.0 * d["final_err_pct"], (c, d)
    assert c["x_progress_ratio"] < 0.5, c
