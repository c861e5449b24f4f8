"""Golden-artifact checks against the reference's saved KITTI trajectories.

The reference ships predicted trajectories for 8 raw drives
(src/vloam_main/results/<drive>/{VO,LO,MO}{0,1}.txt, KITTI 3x4 row format,
writer vloam_tf.cpp:100-106).  Our TrajectoryWriter emits the same format,
so these files are the ground-truth fixture for loader/eval compatibility:
if our tooling reads them and produces sane relative-drift numbers between
the reference's own VO/LO/MO estimates, the exports are interchangeable.
"""

import os

import numpy as np
import pytest

from vloam_tpu.utils.kitti_eval import ate, evaluate
from vloam_tpu.utils.trajectory import TrajectoryWriter, load_kitti_trajectory

_RESULTS = "/root/reference/src/vloam_main/results"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_RESULTS), reason="reference results not available"
)


def _n_rows(path):
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return sum(1 for _ in f)


def _drive(suffix="0"):
    """Drive directory with the longest saved MO{suffix} trajectory (some
    drives only stored short stubs)."""
    drives = sorted(d for d in os.listdir(_RESULTS) if "drive" in d)
    assert drives
    return os.path.join(
        _RESULTS, max(drives, key=lambda d: _n_rows(os.path.join(_RESULTS, d, f"MO{suffix}.txt")))
    )


def test_reference_trajectories_parse():
    d = _drive()
    for name in ("VO0.txt", "LO0.txt", "MO0.txt"):
        traj = load_kitti_trajectory(os.path.join(d, name))
        assert traj.ndim == 3 and traj.shape[1:] == (3, 4)
        assert np.isfinite(traj).all()
        # rotations must be orthonormal
        R = traj[:, :, :3]
        err = np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max()
        assert err < 1e-4


def test_reference_modes_self_consistent():
    """The reference's own MO vs LO on the same drive: identical start, same
    length, and the relative drift between them is bounded (they estimate the
    same trajectory).  Validates our evaluator end-to-end on real artifacts."""
    d = _drive(suffix="1")      # the detached-mode run stores the longest drive
    mo = load_kitti_trajectory(os.path.join(d, "MO1.txt"))
    lo = load_kitti_trajectory(os.path.join(d, "LO1.txt"))
    n = min(len(mo), len(lo))
    assert n > 100
    np.testing.assert_allclose(mo[0], lo[0], atol=1e-6)     # both rebased to cam0@start
    res = evaluate(mo[:n], lo[:n])
    assert res["segments"] > 0
    assert 0.0 < res["trans_pct"] < 30.0                     # LO drifts vs MO, boundedly
    assert ate(mo[:n], lo[:n]) < 100.0


def test_roundtrip_matches_reference_format(tmp_path):
    """Write a reference trajectory through OUR writer; files must be
    line-for-line parseable and numerically identical after reload."""
    d = _drive()
    mo = load_kitti_trajectory(os.path.join(d, "MO0.txt"))[:25]
    import jax.numpy as jnp

    from vloam_tpu import geometry as geo

    p = tmp_path / "out.txt"
    w = TrajectoryWriter(str(p))
    for row in mo:
        T = np.eye(4, dtype=np.float64)
        T[:3] = row
        w.append(geo.pose_from_matrix(jnp.array(T, jnp.float32)))
    w.close()
    back = load_kitti_trajectory(str(p))
    np.testing.assert_allclose(back, mo, atol=2e-4)          # f32 pose roundtrip
