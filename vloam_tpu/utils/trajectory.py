"""KITTI-format trajectory export — reference: vloam_tf.cpp:100-106.

Rows are the 12 floats of the 3x4 [R|t], row-major, written with "%f"
(6 fixed decimals) so files are byte-compatible with the reference output
under src/vloam_main/results/ and feed the same external evaluator
(LeoQLi/KITTI_odometry_evaluation_tool)."""

from __future__ import annotations

import numpy as np

from vloam_tpu import geometry as geo


def pose_to_kitti_row(pose) -> str:
    m = np.asarray(geo.pose_to_matrix(pose))[:3, :4].reshape(-1)
    return " ".join("%f" % v for v in m)


class TrajectoryWriter:
    """Streaming writer for one trajectory file (VO*.txt / LO*.txt / MO*.txt)."""

    def __init__(self, path):
        self._f = open(path, "w")

    def append(self, pose) -> None:
        self._f.write(pose_to_kitti_row(pose) + "\n")

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def load_kitti_trajectory(path) -> np.ndarray:
    """Read a KITTI pose file -> (N, 3, 4)."""
    rows = np.loadtxt(path, dtype=np.float64)
    if rows.ndim == 1:
        rows = rows[None]
    return rows.reshape(-1, 3, 4)
