"""Headline benchmark: full coupled VLOAM pipeline frames/s on one chip.

Baseline: the reference replays KITTI rosbags at 0.33x real time, i.e. an
effective ~3.3 Hz ingest on its author's CPU (vloam_main.launch:13,
BASELINE.md) — the pipeline does not hold the 10 Hz sensor rate.  We measure
steady-state frames/s of the jitted end-to-end step (VO + scan registration
+ LO + mapping, production HDL-64 config) on synthetic raycast frames sized
like KITTI (~100k points, 376x1248 image) and report vs that 3.3 Hz.

Honesty contract (round-3 fix): the timed window drives 100 UNIQUE frames
along an ~80 m trajectory that crosses the 50 m cube-grid boundary at least
once, so per-frame insert scatters, submap-cache rebuilds, and stale-slot
eviction are all inside the measurement — no frame is ever replayed.

Prints ONE JSON line:
  {"metric": "vloam_pipeline_fps", "value": N, "unit": "frames/s", "vs_baseline": N/3.3}
"""

from __future__ import annotations

import json
import time

import numpy as np

N_WARMUP = 4
N_TIMED = 100


def _gen_frames(cfg, ext, n_frames=None, speed=0.8, yaw_rate=0.005, snake=False):
    """Host-side frame stream (not timed): raycast scans + blob images +
    host-gridded lidar layouts, exactly what the production prefetcher feeds.
    Also used by tools/validate_drive.py for longer runs."""
    import jax.numpy as jnp

    from vloam_tpu.data import synthetic
    from vloam_tpu.data.gridding import depth_buckets, grid_cloud, less_flat_voxel_table
    from vloam_tpu.ops.depth_map import DepthBuckets

    vc = cfg.visual
    boxes = synthetic.default_scene()
    if n_frames is None:
        n_frames = N_WARMUP + N_TIMED
    if snake:
        # long drives: weave along the street so the scan always sees
        # structure (a constant yaw rate curves off the scene after ~100
        # frames, degenerating LO to ground-only)
        poses = synthetic.snake_trajectory(n_frames, speed=speed, yaw_amp=yaw_rate)
    else:
        poses = synthetic.straight_trajectory(n_frames, speed=speed, yaw_rate=yaw_rate)
    K = np.asarray(ext.P_rect0)[:, :3].astype(np.float64)
    proj = np.asarray(ext.P_rect0 @ ext.R_rect0 @ ext.cam_T_velo)
    rng = np.random.default_rng(11)

    box_cx = (boxes[:, 0] + boxes[:, 3]) / 2.0

    blob_world = np.zeros((0, 3))
    frames = []
    for i, (R, t) in enumerate(poses):
        R_wc = R @ synthetic.CAM_R_WORLD.T
        if i % 8 == 0:
            # extend the persistent world texture ahead of the camera so VO
            # always has trackable features along the whole drive
            uv = np.stack(
                [rng.uniform(20, vc.img_width - 20, 700),
                 rng.uniform(20, vc.img_height - 20, 700)], -1
            )
            pc, hit = synthetic.raycast_camera(R_wc, t, boxes, K, uv)
            blob_world = np.concatenate([blob_world, (pc[hit] @ R_wc.T) + t])

        # rays reach 80 m: boxes farther than 100 m from the sensor cannot be
        # hit — culling them is exact and cuts the raycast ~3x
        near = boxes[np.abs(box_cx - t[0]) < 100.0]
        cloud = synthetic.simulate_scan(R, t, near, n_azimuth=1800, noise=0.005, seed=i)

        vis = blob_world[np.linalg.norm(blob_world - t, axis=1) < 90.0]
        img = synthetic.render_blob_image((vis - t) @ R_wc, K, vc.img_height, vc.img_width)

        grid, gmask, _ = grid_cloud(cloud, cfg.scan)
        bu, bv, bz, bc = depth_buckets(grid.reshape(-1, 4), gmask.reshape(-1), proj, vc)
        buckets = DepthBuckets(jnp.array(bu), jnp.array(bv), jnp.array(bz), jnp.array(bc))
        sg, bs, nr = less_flat_voxel_table(grid, gmask, cfg.scan)
        lf = (jnp.array(sg), jnp.array(bs), jnp.array(nr, np.int32))
        frames.append((jnp.array(img), jnp.array(grid), jnp.array(gmask), buckets, lf))
    return frames, poses


def main() -> None:
    import jax

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.models import frame_graph as fg
    from vloam_tpu.models.vloam import init_vloam_state, vloam_step

    cfg = kitti_hdl64()
    ext = fg.kitti_default_extrinsics()
    frames, _ = _gen_frames(cfg, ext)

    # donated state => in-place cube-map updates (no per-frame copy)
    step = jax.jit(
        lambda s, i, c, m, b, t: vloam_step(
            s, i, c, m, ext, cfg, pre_gridded=True, pre_buckets=b, pre_lf_table=t
        ),
        donate_argnums=0,
    )
    state = init_vloam_state(cfg)

    # warm-up: compile + map bootstrap
    for f in frames[:N_WARMUP]:
        state, out = step(state, *f)
    np.asarray(out.mo_pose)

    # Steady-state throughput over 100 unique frames (cube-boundary crossing
    # included); one final fetch closes the timing window through the full
    # sequential state dependency.
    t0 = time.perf_counter()
    for f in frames[N_WARMUP:]:
        state, out = step(state, *f)
    np.asarray(out.mo_pose)
    fps = N_TIMED / (time.perf_counter() - t0)
    baseline_fps = 3.3
    print(
        json.dumps(
            {
                "metric": "vloam_pipeline_fps",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
