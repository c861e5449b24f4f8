"""Sharded mapping on the 8-device virtual CPU mesh vs the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu.config import MappingConfig, ScanConfig, kitti_hdl64
from vloam_tpu.data import synthetic
from vloam_tpu.models.laser_mapping import init_map_state, mapping_step
from vloam_tpu.models.lidar_odometry import init_lo_state, lo_step
from vloam_tpu.ops.scan_registration import extract_features
from vloam_tpu.parallel.mapping_shard import make_sharded_step
from vloam_tpu.parallel.mesh import map_mesh

CFG = kitti_hdl64().replace(
    scan=ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=16384),
    mapping=MappingConfig(
        grid_w=7, grid_h=7, grid_d=3,
        corner_cube_cap=1024, surf_cube_cap=2048,
        corner_stack_cap=2048, surf_stack_cap=4096,
    ),
)


@pytest.mark.slow
def test_sharded_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual devices"
    mesh = map_mesh(n_dev)

    scene = synthetic.default_scene()
    poses = synthetic.straight_trajectory(4, speed=0.8, yaw_rate=0.01)
    lo = init_lo_state(CFG)
    mp_single = init_map_state(CFG)
    mp_shard = init_map_state(CFG, n_shards=n_dev)
    sh_step = make_sharded_step(CFG, mesh)

    feats_seq = []
    wodoms = []
    for i, (R, t) in enumerate(poses):
        pts = synthetic.simulate_scan(R, t, scene, n_azimuth=700, noise=0.005, seed=i)
        p, m = synthetic.pad_cloud(pts, CFG.scan.max_points)
        feats = extract_features(jnp.array(p), jnp.array(m), CFG.scan)
        lo, _, wodom, _ = lo_step(lo, feats, CFG)
        feats_seq.append(feats)
        wodoms.append(wodom)

    for feats, wodom in zip(feats_seq, wodoms):
        mp_single, pose_single = mapping_step(
            mp_single, feats.less_sharp, feats.less_sharp_mask,
            feats.less_flat, feats.less_flat_mask, wodom, CFG,
        )
        mp_shard, pose_shard = sh_step(
            mp_shard, feats.less_sharp, feats.less_sharp_mask,
            feats.less_flat, feats.less_flat_mask, wodom,
        )
        np.testing.assert_allclose(
            np.asarray(pose_shard), np.asarray(pose_single), atol=5e-3
        )

    # map contents agree in total point counts (same insertions, different
    # layout).  A handful of points sit exactly on the dedup-gate voxel
    # boundary, where float reassociation across shard layouts can flip the
    # keep/drop decision — allow a 0.5% relative slack.
    c_single = int(mp_single.corner_cnt.sum())
    s_single = int(mp_single.surf_cnt.sum())
    assert abs(int(mp_shard.corner_cnt.sum()) - c_single) <= max(5, c_single // 200)
    assert abs(int(mp_shard.surf_cnt.sum()) - s_single) <= max(5, s_single // 200)
    # cube arrays really are sharded
    assert mp_shard.cube_pts.sharding.is_fully_replicated is False
