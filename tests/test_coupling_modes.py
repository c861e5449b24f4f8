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


@pytest.mark.slow
def test_turn_onset_seed_beats_warm_start():
    """The mechanism behind the production-scale coupled win
    (VALIDATION_r05 coupling_production_*_window, PERF.md turn-rate
    table), pinned small with ONE short drive: at a 10 deg/frame turn
    ONSET the constant-motion warm start is wrong by the full turn rate
    while the camera measures the actual rotation, so the VO seed error
    must be several times below the warm-start error.  (Whether that
    seed advantage converts into an end-to-end win depends on scene
    range -- association breaks when range * turn_rate exceeds LO's 5 m
    gate -- which needs the production course; here we pin the seed
    telemetry itself.)"""
    from vloam_tpu.models import frame_graph as fg
    from vloam_tpu.runtime.driver import VloamDriver

    straight, turn_frames = 24, 9     # one 90-deg turn at 10 deg/frame
    n = straight + turn_frames
    poses = synthetic.turns_trajectory(
        n, speed=1.1, straight=straight, turn_frames=turn_frames
    )
    world = sc.route_world(poses)
    ext = fg.kitti_default_extrinsics()
    K = np.asarray(ext.P_rect0)[:, :3].astype(np.float64)
    vc = CFG.visual
    tex_fn = sc.raycast_blob_anchors(
        poses, world, K, vc.img_height, vc.img_width
    )

    from vloam_tpu import geometry as geo
    from vloam_tpu import geometry_np as gnp
    import jax.numpy as jnp

    def rot_err_deg(a, b):
        d = gnp.pose_compose(gnp.pose_inverse(gnp.as_pose64(a)),
                             gnp.as_pose64(b))
        return float(np.degrees(2.0 * np.arccos(np.clip(abs(d[3]), -1, 1))))

    driver = VloamDriver(CFG.replace(detach_vo_lo=True), ext)
    errs = {}
    prev_lo = None
    for i, (R, t) in enumerate(poses):
        cloud = synthetic.simulate_scan(R, t, world, n_azimuth=700,
                                        noise=0.005, seed=i)
        R_wc = R @ synthetic.CAM_R_WORLD.T
        img = synthetic.render_blob_image((tex_fn(i) - t) @ R_wc, K,
                                          vc.img_height, vc.img_width)
        out = driver.process(img, cloud)
        if i > 0:
            R0, t0 = poses[i - 1]
            Rrel, trel = R0.T @ R, R0.T @ (t - t0)
            q = np.asarray(geo.matrix_to_quat(jnp.array(Rrel, jnp.float32)),
                           np.float64)
            gtd = np.concatenate([q, trel])
            errs[i] = {
                "vo_seed": rot_err_deg(gtd, np.asarray(out.vo_delta)),
                "warm": (rot_err_deg(gtd, prev_lo)
                         if prev_lo is not None else None),
            }
        prev_lo = np.asarray(out.lo_delta)
    driver.close()

    onset = errs[straight]            # first turn frame: warm start is the
    # straight-line delta, ~10 deg wrong; VO measures the actual rotation
    assert onset["warm"] > 5.0, onset
    assert onset["vo_seed"] < 0.5 * onset["warm"], onset
    # mid-turn the warm start recovers (constant rotation is right again)
    mid = errs[straight + 4]
    assert mid["warm"] < 2.0, mid
