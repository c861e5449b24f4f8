"""Full coupled-pipeline integration: VO+LO+MO + frame graph + export."""

import os

import numpy as np
import jax
import pytest

from vloam_tpu.config import MappingConfig, ScanConfig, kitti_hdl64
from vloam_tpu.runtime.driver import run_synthetic
from vloam_tpu.utils.trajectory import load_kitti_trajectory

CFG = kitti_hdl64().replace(
    scan=ScanConfig(ring_cap=1024, max_points=65536, less_flat_cap=16384),
    mapping=MappingConfig(
        grid_w=7, grid_h=7, grid_d=3,
        corner_cube_cap=1024, surf_cube_cap=2048,
        corner_stack_cap=2048, surf_stack_cap=4096,
    ),
)


@pytest.mark.slow
def test_full_pipeline_synthetic(tmp_path):
    res = run_synthetic(CFG, n_frames=5, speed=0.8, yaw_rate=0.005,
                        out_dir=str(tmp_path), n_azimuth=700, verbose=False)
    assert res["final_err_mo_m"] < 0.08
    assert res["final_err_lo_m"] < 0.15
    # trajectory files exist, parse, and have one row per frame
    for name in ["VO1.txt", "LO1.txt", "MO1.txt"]:
        traj = load_kitti_trajectory(os.path.join(tmp_path, name))
        assert traj.shape == (5, 3, 4)
        # rotation block is orthonormal
        R = traj[-1, :, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # MO trajectory endpoint ~ straight-line path in cam0 frame (z forward)
    mo = load_kitti_trajectory(os.path.join(tmp_path, "MO1.txt"))
    assert abs(np.linalg.norm(mo[-1, :, 3]) - 3.2) < 0.1


@pytest.mark.slow
def test_coupled_mode_runs(tmp_path):
    cfg = CFG.replace(detach_vo_lo=False)
    res = run_synthetic(cfg, n_frames=4, speed=0.8, out_dir=str(tmp_path),
                        n_azimuth=700, verbose=False)
    assert res["final_err_mo_m"] < 0.1
    assert os.path.exists(os.path.join(tmp_path, "MO0.txt"))  # suffix 0 = coupled


@pytest.mark.slow
def test_mapping_skip_frame(tmp_path):
    """skip_frame=2: mapping registers every other frame; skipped frames get
    the propagated wmap_wodom o wodom pose (laser_mapping.cpp:184-208) and
    accuracy stays within loose bounds."""
    import dataclasses

    cfg = CFG.replace(mapping=dataclasses.replace(CFG.mapping, skip_frame=2))
    res = run_synthetic(cfg, n_frames=5, speed=0.8, out_dir=str(tmp_path),
                        n_azimuth=700, verbose=False)
    assert res["final_err_mo_m"] < 0.2
    traj = load_kitti_trajectory(os.path.join(tmp_path, "MO1.txt"))
    assert traj.shape == (5, 3, 4)


@pytest.mark.slow
def test_pose_graph_refinement(tmp_path):
    """--refine: post-sequence pose-graph fusion of the VO/LO/MO chains
    writes MO{d}_refined.txt and does not degrade the MO estimate."""
    res = run_synthetic(CFG, n_frames=5, speed=0.8, yaw_rate=0.005,
                        out_dir=str(tmp_path), n_azimuth=700, verbose=False,
                        refine=True)
    assert "final_err_refined_m" in res
    # fusion with the (noisier) LO/VO chains must stay in the MO error class
    assert res["final_err_refined_m"] < max(2.5 * res["final_err_mo_m"], 0.1)
    traj = load_kitti_trajectory(os.path.join(tmp_path, "MO1_refined.txt"))
    assert traj.shape == (5, 3, 4)
    R = traj[-1, :, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
