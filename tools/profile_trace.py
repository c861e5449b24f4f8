"""Device-trace profiler for the production bench step.

Runs the same jitted coupled step as bench.py under ``jax.profiler.trace``,
then aggregates the TPU device-track events from the exported
``*.trace.json.gz`` into per-op and per-prefix totals.  This is the tool the
optimization story in PERF.md was driven by (the per-stage numbers in its
"Where the time goes" table come from these aggregates).

Usage:
    python tools/profile_trace.py [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step_and_frames():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import synthetic
    from vloam_tpu.data.gridding import depth_buckets, grid_cloud, less_flat_voxel_table
    from vloam_tpu.models import frame_graph as fg
    from vloam_tpu.models.vloam import init_vloam_state, vloam_step
    from vloam_tpu.ops.depth_map import DepthBuckets

    cfg = kitti_hdl64()
    ext = fg.kitti_default_extrinsics()
    vc = cfg.visual
    boxes = synthetic.default_scene()
    poses = synthetic.straight_trajectory(6, speed=0.8, yaw_rate=0.005)
    K = np.asarray(ext.P_rect0)[:, :3].astype(np.float64)
    rng = np.random.default_rng(11)
    uv0 = np.stack(
        [rng.uniform(20, vc.img_width - 20, 1400), rng.uniform(20, vc.img_height - 20, 1400)],
        -1,
    )
    R_wc0 = poses[0][0] @ synthetic.CAM_R_WORLD.T
    pc0, hit = synthetic.raycast_camera(R_wc0, poses[0][1], boxes, K, uv0)
    blob_world = (pc0[hit] @ R_wc0.T) + poses[0][1]
    proj = np.asarray(ext.P_rect0 @ ext.R_rect0 @ ext.cam_T_velo)
    frames = []
    for i, (R, t) in enumerate(poses):
        cloud = synthetic.simulate_scan(R, t, boxes, n_azimuth=1800, noise=0.005, seed=i)
        R_wc = R @ synthetic.CAM_R_WORLD.T
        img = synthetic.render_blob_image((blob_world - t) @ R_wc, K, vc.img_height, vc.img_width)
        grid, gmask, _ = grid_cloud(cloud, cfg.scan)
        bu, bv, bz, bc = depth_buckets(grid.reshape(-1, 4), gmask.reshape(-1), proj, vc)
        buckets = DepthBuckets(jnp.array(bu), jnp.array(bv), jnp.array(bz), jnp.array(bc))
        sg, bs, nr = less_flat_voxel_table(grid, gmask, cfg.scan)
        lf = (jnp.array(sg), jnp.array(bs), jnp.array(nr, np.int32))
        frames.append((jnp.array(img), jnp.array(grid), jnp.array(gmask), buckets, lf))

    step = jax.jit(
        lambda s, i, c, m, b, t: vloam_step(
            s, i, c, m, ext, cfg, pre_gridded=True, pre_buckets=b, pre_lf_table=t
        ),
        donate_argnums=0,
    )
    state = init_vloam_state(cfg)
    return step, state, frames


def aggregate(trace_dir: str, n_steps: int, top: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace files found under", trace_dir)
        return
    # Merge events from every exported trace file (multi-device / multi-host
    # exports write one file per host; taking only the newest silently drops
    # the other devices' tracks).
    events = []
    for p in sorted(paths):
        with gzip.open(p, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))
    if len(paths) > 1:
        print(f"merged {len(paths)} trace files")
    # Device-track pids: process names containing TPU / device.
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e["pid"])
    if not dev_pids:
        print(
            "WARNING: no TPU/device process tracks found in the trace "
            "(CPU-only run?) — nothing to aggregate."
        )
        return
    # XLA trace exports nest parallel tracks under the device process:
    # 'XLA Modules' (whole-module spans), 'XLA Ops' (per-op), 'XLA TraceMe',
    # plus step tracks.  Summing all ph=='X' events across every thread
    # double-counts module spans over the ops inside them, so restrict to
    # the 'XLA Ops' tids only.
    op_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if e.get("args", {}).get("name") == "XLA Ops" and e.get("pid") in dev_pids:
                op_tids.add((e["pid"], e.get("tid")))
    if not op_tids:
        print(
            "WARNING: device tracks found but no 'XLA Ops' thread — falling "
            "back to all device threads (totals may double-count module spans)."
        )
    # Collect op events, then convert to SELF time: control-flow ops (cond /
    # while / fusion regions) export spans that contain their body ops on the
    # same thread, so raw durations double-count.  Subtract each event's
    # directly-nested children via an interval sweep per tid.
    evs = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if op_tids and (e["pid"], e.get("tid")) not in op_tids:
            continue
        evs.append((e["pid"], e.get("tid"), e.get("ts", 0), e.get("dur", 0),
                    e.get("name", "?")))
    by_op: dict[str, float] = collections.defaultdict(float)
    cnt: dict[str, int] = collections.defaultdict(int)
    total = 0.0
    by_tid: dict[tuple, list] = collections.defaultdict(list)
    for pid, tid, ts, dur, name in evs:
        by_tid[(pid, tid)].append((ts, dur, name))
    for tid_evs in by_tid.values():
        tid_evs.sort(key=lambda e: (e[0], -e[1]))   # by start, longest first
        stack = []  # (end, child_sum_accumulator_index)
        selfs = []
        for ts, dur, name in tid_evs:
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                selfs[stack[-1][1]][1] -= dur       # subtract from parent
            selfs.append([name, dur])
            stack.append((ts + dur, len(selfs) - 1))
        for name, self_dur in selfs:
            ms = max(self_dur, 0) / 1e3
            by_op[name] += ms
            cnt[name] += 1
            total += ms
    print(f"device total {total:.2f} ms over {n_steps} steps = {total/n_steps:.3f} ms/step\n")
    print(f"{'ms/step':>9}  {'count':>6}  op")
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms/n_steps:9.3f}  {cnt[name]//n_steps:6d}  {name[:110]}")
    # prefix rollup (fusion names like fusion.123 share cost classes poorly;
    # group by leading alpha token)
    by_pref: dict[str, float] = collections.defaultdict(float)
    for name, ms in by_op.items():
        pref = name.split(".")[0].split("(")[0]
        by_pref[pref] += ms
    print("\nby prefix:")
    for name, ms in sorted(by_pref.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ms/n_steps:9.3f}  {name[:80]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument(
        "--outdir",
        default=None,
        help="write the trace here and keep it (for TensorBoard); "
        "default is a temp dir removed after aggregation",
    )
    args = ap.parse_args()

    import shutil

    import jax
    import numpy as np

    step, state, frames = build_step_and_frames()
    for f in frames[:2]:
        state, out = step(state, *f)
    np.asarray(out.mo_pose)

    trace_dir = args.outdir or tempfile.mkdtemp(prefix="vloam_trace_")
    with jax.profiler.trace(trace_dir):
        for k in range(args.steps):
            f = frames[2 + k % (len(frames) - 2)]
            state, out = step(state, *f)
        np.asarray(out.mo_pose)
    print("trace dir:", trace_dir)
    try:
        aggregate(trace_dir, args.steps, args.top)
    finally:
        if args.outdir is None:
            shutil.rmtree(trace_dir, ignore_errors=True)
            print("(temp trace removed; pass --outdir to keep it for TensorBoard)")


if __name__ == "__main__":
    main()
