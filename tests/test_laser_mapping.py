"""End-to-end scan-to-map odometry: mapping must beat plain LO on drift."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu.config import MappingConfig, ScanConfig, kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.models.laser_mapping import (
    coord_to_slot,
    cube_coord_of,
    init_map_state,
    mapping_step,
)
from vloam_tpu.models.lidar_odometry import init_lo_state, lo_step
from vloam_tpu.ops.scan_registration import extract_features

CFG = kitti_hdl64().replace(
    scan=ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=16384),
    mapping=MappingConfig(
        grid_w=7, grid_h=7, grid_d=3,
        corner_cube_cap=1024, surf_cube_cap=2048,
        corner_stack_cap=2048, surf_stack_cap=4096,
    ),
)


def test_cube_addressing():
    pts = jnp.array([[0.0, 0.0, 0.0], [24.9, -25.1, 60.0], [-90.0, 10.0, -30.0]])
    c = np.asarray(cube_coord_of(pts, 50.0))
    np.testing.assert_array_equal(c, [[0, 0, 0], [0, -1, 1], [-2, 0, -1]])
    # block-cyclic slots stay in range and are injective within the grid window
    coords = jnp.stack(
        jnp.meshgrid(jnp.arange(-3, 4), jnp.arange(-3, 4), jnp.arange(-1, 2), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    slots = np.asarray(coord_to_slot(coords, CFG))
    assert slots.min() >= 0 and slots.max() < 7 * 7 * 3
    assert len(np.unique(slots)) == len(slots)  # no aliasing inside one window


@pytest.mark.slow
def test_mapping_beats_lo():
    scene = synthetic.default_scene()
    poses = synthetic.straight_trajectory(5, speed=0.8, yaw_rate=0.01)
    lo = init_lo_state(CFG)
    mp = init_map_state(CFG)

    @jax.jit
    def step(lo, mp, p, m):
        feats = extract_features(p, m, CFG.scan)
        lo, delta, wodom, _ = lo_step(lo, feats, CFG)
        mp, wmap = mapping_step(
            mp, feats.less_sharp, feats.less_sharp_mask,
            feats.less_flat, feats.less_flat_mask, wodom, CFG,
        )
        return lo, mp, wodom, wmap

    for i, (R, t) in enumerate(poses):
        pts = synthetic.simulate_scan(R, t, scene, n_azimuth=700, noise=0.005, seed=i)
        p, m = synthetic.pad_cloud(pts, CFG.scan.max_points)
        lo, mp, wodom, wmap = step(lo, mp, jnp.array(p), jnp.array(m))

    gt = poses[-1][1]
    err_lo = np.linalg.norm(np.asarray(wodom)[4:] - gt)
    err_mo = np.linalg.norm(np.asarray(wmap)[4:] - gt)
    assert err_mo < 0.05, err_mo           # < 5 cm after 3.2 m
    assert err_mo <= err_lo + 1e-3          # mapping never worse than LO
    assert int(mp.corner_cnt.sum()) > 500 and int(mp.surf_cnt.sum()) > 1500
