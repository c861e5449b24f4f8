"""The full coupled VLOAM pipeline — reference: vloam_main_node.cpp:134-202.

One jitted step reproduces the reference callback ordering:
  image -> VO -> frame-graph conversion -> scan registration -> LO (seeded by
  VO when coupled) -> mapping -> world poses for VO/LO/MO export.

``detach_vo_lo`` selects the reference's (D)/(C) modes
(vloam_main_node.cpp:256-257 + laser_odometry.cpp:237-250): when detached,
LO warm-starts from its previous solution and VO is a passenger; when
coupled, VO's frame-to-frame motion (converted to the velodyne frame) seeds
LO, and the LO result seeds the next frame's VO.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vloam_tpu import geometry as geo
from vloam_tpu.config import VloamConfig
from vloam_tpu.models import frame_graph as fg
from vloam_tpu.models.laser_mapping import MapState, init_map_state, mapping_step
from vloam_tpu.models.lidar_odometry import LoState, init_lo_state, lo_step
from vloam_tpu.models.visual_odometry import VoState, init_vo_state, vo_step
from vloam_tpu.ops.scan_registration import extract_features, extract_features_from_grid


class VloamState(NamedTuple):
    vo: VoState
    lo: LoState
    mp: MapState
    world_VOT_base: jax.Array            # (7,) accumulated VO world pose
    cam0_curr_LOT_cam0_prev: jax.Array   # (7,) LO f2f in cam0 frame (VO seed)
    cam0_init_T_cam0_start: jax.Array    # (7,) rebase anchor captured at frame 0
    count: jax.Array                     # () int32


class VloamOutputs(NamedTuple):
    vo_pose: jax.Array    # (7,) cam0_start_T_cam0_curr (VO trajectory row)
    lo_pose: jax.Array    # (7,) LO trajectory row
    mo_pose: jax.Array    # (7,) MO trajectory row
    world_vo: jax.Array   # (7,) world_T_base from VO
    world_lo: jax.Array   # (7,) world_T_base from LO
    world_mo: jax.Array   # (7,) world_T_base from mapping
    lo_corr: jax.Array    # (2,) int32 LO edge/plane correspondence counts
                          # (the degradation signal of laser_odometry.cpp:489-496)
    # Per-frame deltas for the host-side f64 world chains (the reference
    # accumulates world poses in Ceres doubles, laser_odometry.cpp:524-525;
    # the in-jit f32 chains above remain the device-side coupling state):
    vo_delta: jax.Array       # (7,) velo_last_VOT_velo_curr (this frame's VO motion)
    lo_delta: jax.Array       # (7,) velo_last_LOT_velo_curr
    mo_correction: jax.Array  # (7,) wmap_T_wodom after this frame's mapping update
                              #      (world_MO = mo_correction o world_LO exactly)


def init_vloam_state(cfg: VloamConfig, n_map_shards: int = 1) -> VloamState:
    return VloamState(
        vo=init_vo_state(cfg),
        lo=init_lo_state(cfg),
        mp=init_map_state(cfg, n_shards=n_map_shards),
        world_VOT_base=geo.pose_identity(),
        cam0_curr_LOT_cam0_prev=geo.pose_identity(),
        cam0_init_T_cam0_start=geo.pose_identity(),
        count=jnp.array(0, jnp.int32),
    )


def vloam_step(
    state: VloamState,
    img: jax.Array,           # (H, W) float32
    cloud: jax.Array,         # (N, 3|4) velodyne frame — or (R, C, 4) ring grid
    cloud_mask: jax.Array,    # (N,) — or (R, C) grid mask
    ext: fg.Extrinsics,
    cfg: VloamConfig,
    pre_gridded: bool = False,
    pre_buckets=None,         # DepthBuckets built by the host data layer
    pre_lf_table=None,        # less-flat voxel table built by the host data layer
    mapping_fn=None,          # override the MO stage (parallel/vloam_shard.py
                              # passes the shard_map-local sharded twin)
) -> tuple[VloamState, VloamOutputs]:
    """One coupled frame.  With ``pre_gridded=True`` the lidar inputs are the
    host-built ring grid (data/gridding.py) — the device skips organize_scan
    (the O(N) ring ranking the host does for free inside the prefetcher).
    ``pre_buckets`` likewise moves the VO depth-bucket build
    (data/gridding.depth_buckets) into the host data layer."""
    if mapping_fn is None:
        mapping_fn = mapping_step
    if pre_gridded:
        grid, gmask = cloud, cloud_mask
        n_per_ring = jnp.sum(gmask, axis=1).astype(jnp.int32)
        flat_cloud = grid.reshape(-1, 4)[:, :3]
        flat_mask = gmask.reshape(-1)
    else:
        flat_cloud, flat_mask = cloud[..., :3], cloud_mask

    # ---- Sec 1+3+4: visual odometry (vloam_main_node.cpp:147-174) ----------
    # jax.named_scope = the TicToc per-stage breakdown of the reference
    # (lidar_odometry_mapping.cpp:95-175) as profiler trace annotations
    with jax.named_scope("visual_odometry"):
        proj = ext.P_rect0 @ ext.R_rect0 @ ext.cam_T_velo
        K = ext.P_rect0[:, :3]
        vo_state, cam0_curr_T_cam0_last = vo_step(
            state.vo, img, flat_cloud, flat_mask, proj, K, cfg,
            lo_prior=state.cam0_curr_LOT_cam0_prev, pre_buckets=pre_buckets,
        )

    # frame-graph conversion + world accumulation (vloam_main_node.cpp:176-181)
    velo_last_VOT_velo_curr = fg.vo_to_velo(cam0_curr_T_cam0_last, ext)
    world_VOT_base = fg.accumulate_world(state.world_VOT_base, velo_last_VOT_velo_curr)

    # ---- Sec 5: scan registration + LO + mapping (:186-190) ----------------
    with jax.named_scope("scan_registration"):
        if pre_gridded:
            feats = extract_features_from_grid(
                grid, gmask, n_per_ring, cfg.scan, lf_table=pre_lf_table
            )
        else:
            feats = extract_features(flat_cloud, flat_mask, cfg.scan)

    with jax.named_scope("laser_odometry"):
        vo_prior = None if cfg.detach_vo_lo else velo_last_VOT_velo_curr
        lo_state, lo_delta, world_LOT_base, lo_corr = lo_step(state.lo, feats, cfg, vo_prior=vo_prior)

    cam0_curr_LOT_cam0_prev = fg.lo_delta_to_cam0(lo_delta, ext)

    with jax.named_scope("laser_mapping"):
        if cfg.mapping.skip_frame > 1:
            # mapping_skip_frame > 1: register only every Nth frame; skipped
            # frames get the high-frequency propagated pose wmap_wodom o wodom
            # (laser_mapping.cpp:184-208, 824-862).
            def run(_):
                return mapping_fn(
                    state.mp, feats.less_sharp, feats.less_sharp_mask,
                    feats.less_flat, feats.less_flat_mask, world_LOT_base, cfg,
                )

            def skip(_):
                return state.mp, geo.pose_compose(state.mp.wmap_wodom, world_LOT_base)

            mp_state, world_MOT_base = jax.lax.cond(
                state.count % cfg.mapping.skip_frame == 0, run, skip, None
            )
        else:
            mp_state, world_MOT_base = mapping_fn(
                state.mp, feats.less_sharp, feats.less_sharp_mask,
                feats.less_flat, feats.less_flat_mask, world_LOT_base, cfg,
            )

    # ---- Sec 6: rebased trajectory rows (vloam_tf.cpp:84-160) --------------
    anchor = jnp.where(
        state.count == 0, fg.cam0_init_pose(world_VOT_base, ext), state.cam0_init_T_cam0_start
    )
    vo_row = fg.world_to_cam0_start(world_VOT_base, anchor, ext)
    lo_row = fg.world_to_cam0_start(world_LOT_base, anchor, ext)
    mo_row = fg.world_to_cam0_start(world_MOT_base, anchor, ext)

    new_state = VloamState(
        vo=vo_state, lo=lo_state, mp=mp_state,
        world_VOT_base=world_VOT_base,
        cam0_curr_LOT_cam0_prev=cam0_curr_LOT_cam0_prev,
        cam0_init_T_cam0_start=anchor,
        count=state.count + 1,
    )
    return new_state, VloamOutputs(
        vo_pose=vo_row, lo_pose=lo_row, mo_pose=mo_row,
        world_vo=world_VOT_base, world_lo=world_LOT_base, world_mo=world_MOT_base,
        lo_corr=lo_corr,
        vo_delta=velo_last_VOT_velo_curr, lo_delta=lo_delta,
        mo_correction=mp_state.wmap_wodom,
    )
