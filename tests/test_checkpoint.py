"""Checkpoint/resume roundtrip of the full pipeline state."""

import numpy as np
import jax

from vloam_tpu.config import MappingConfig, ScanConfig, kitti_hdl64
from vloam_tpu.models.vloam import init_vloam_state
from vloam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

CFG = kitti_hdl64().replace(
    scan=ScanConfig(ring_cap=128, max_points=4096, less_flat_cap=4096),
    mapping=MappingConfig(grid_w=5, grid_h=5, grid_d=3, corner_cube_cap=128,
                          surf_cube_cap=256, corner_stack_cap=256, surf_stack_cap=512),
)


def test_checkpoint_roundtrip(tmp_path, rng):
    state = init_vloam_state(CFG)
    # mutate a few leaves so the roundtrip is non-trivial
    state = state._replace(
        world_VOT_base=state.world_VOT_base.at[4].set(3.25),
        count=state.count + 17,
        mp=state.mp._replace(corner_cnt=state.mp.corner_cnt.at[3].set(9)),
    )
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, 17)

    fresh = init_vloam_state(CFG)
    restored, frame = load_checkpoint(path, fresh)
    assert frame == 17
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
