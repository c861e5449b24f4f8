"""Demonstrate the coupling (C)/(D) switch doing its reference-shaped job.

Two scenarios from vloam_tpu/data/scenarios.py, each run in BOTH modes:

* corridor — lidar-degenerate: coupled must win (VO seed supplies the
  wall-parallel translation LO cannot observe).
* highway  — lead vehicle + sparse structure: coupled must degrade
  (the truck-locked VO seed selects the wrong Huber basin), decoupled's
  constant-velocity warm start stays robust.  Reference Table-I seq 01:
  45.36 % (C) vs 2.72 % (D).

Writes the results under "coupling_scenarios" in VALIDATION_r04.json.
Runtime ~10-15 min on the 2-core box (raycast + per-frame pipeline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--out", default="VALIDATION_r04.json")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.data import scenarios as sc
    from vloam_tpu.data import synthetic

    cfg = kitti_hdl64()
    results = {}

    # --- corridor ---------------------------------------------------------
    n = args.frames
    speed = 0.9
    length = n * speed + 40.0
    walls = sc.corridor_scene(length)
    tex = sc.corridor_texture(length)
    poses = synthetic.straight_trajectory(n, speed=speed)
    print(f"[corridor] {n} frames, {n * speed:.0f} m, degenerate LO geometry")
    results["corridor"] = sc.compare_modes(
        cfg, poses, lambda i: walls, lambda i: tex, verbose=args.verbose
    )
    for m, r in results["corridor"].items():
        print(f"  {m}: final {r['final_err_pct']:.1f} % "
              f"progress {r['x_progress_ratio']:.2f}")

    # --- highway ----------------------------------------------------------
    speeds = sc.highway_speeds(n)
    poses = sc.straight_poses_from_speeds(speeds)
    length = float(np.sum(speeds)) + 60.0
    static = sc.highway_static_scene(length)
    static_tex = sc.highway_static_texture(length)

    def boxes_fn(i):
        x_ego = poses[i][1][0]
        return np.concatenate([static, sc.truck_box(x_ego + 14.0)])

    def texture_fn(i):
        x_ego = poses[i][1][0]
        return np.concatenate([sc.truck_texture(x_ego + 14.0), static_tex])

    print(f"[highway] {n} frames, {np.sum(speeds):.0f} m, lead truck @14 m gap")
    results["highway"] = sc.compare_modes(
        cfg, poses, boxes_fn, texture_fn, verbose=args.verbose
    )
    for m, r in results["highway"].items():
        print(f"  {m}: final {r['final_err_pct']:.1f} % "
              f"progress {r['x_progress_ratio']:.2f}")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out
    )
    record = {}
    if os.path.exists(out_path):
        with open(out_path) as fp:
            record = json.load(fp)
    record["coupling_scenarios"] = {
        "note": (
            "synthetic stress scenarios for the (C)/(D) switch: corridor = "
            "lidar-degenerate (coupled must win), highway = lead vehicle + "
            "sparse structure (coupled must degrade, the seq-01 signature; "
            "reference Table-I seq 01: C 45.36 % vs D 2.72 %)"
        ),
        **results,
    }
    with open(out_path, "w") as fp:
        json.dump(record, fp, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
