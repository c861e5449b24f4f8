"""Checkpoint / resume — a subsystem the reference lacks entirely
(SURVEY.md §5.4: map cubes + poses live only in RAM; a crash restarts the
sequence).  The whole pipeline state is one pytree, so snapshotting is a
single orbax save; long KITTI sequences become resumable jobs.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, state, frame_index: int) -> None:
    """Snapshot a VloamState (or any pytree) + frame counter to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {"state": jax.tree.map(np.asarray, state), "frame": np.asarray(frame_index, np.int64)},
        force=True,
    )
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template_state):
    """Restore (state, frame_index); ``template_state`` supplies the pytree
    structure/shapes (from init_vloam_state(cfg))."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {"state": jax.tree.map(np.asarray, template_state), "frame": np.asarray(0, np.int64)}
    restored = ckptr.restore(path, target)
    state = jax.tree.unflatten(jax.tree.structure(template_state),
                               jax.tree.leaves(restored["state"]))
    return state, int(restored["frame"])
