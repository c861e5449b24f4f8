"""Speed-of-light audit of the three big Pallas kernels (PERF.md table).

For each kernel at its PRODUCTION shapes (kitti_hdl64 config), compares the
measured per-call device time against two analytic bounds:

  * HBM bound  = bytes_touched / 819 GB/s   (public TPU v5e HBM bandwidth)
  * VPU bound  = flops / 3.9 Tf32/s         (8 sublanes x 128 lanes x 4 ALUs
                                             x ~0.94 GHz per TensorCore —
                                             the VPU, not the MXU: these
                                             kernels do elementwise f32
                                             compute, not matmuls)

and reports achieved GB/s, achieved Gflop/s, and percent-of-binding-bound.
Byte/FLOP formulas are written next to each entry — the audit is an argued
claim, not a profiler dump.  Timing follows the axon rule: dispatch N,
fetch once (PERF.md "Reproducing").

MEASUREMENT CAVEAT (round-5 finding): isolated per-op timing through the
axon tunnel has a ~0.8 ms PER-DISPATCH floor — an empty jitted op measures
the same ~0.8 ms with this harness, and a `lax.scan` that re-invokes a
kernel in-graph pays the same ~0.8 ms PER ITERATION.  Any measured_ms at or
below the printed dispatch floor is therefore an upper bound on the true
device time, not a kernel measurement.  Ground truth for sub-floor ops is
the in-step device trace (tools/profile_trace.py): e.g. round 4 recorded
gather_patches_pair at 0.814 ms here, while the device trace shows
_gather_stacked_tpu at 0.301 ms inside the production step — the 0.5 ms gap
was dispatch, and round 4's "largest op left in the step" conclusion was an
artifact.  The tool now measures and prints the floor first and stamps it
into the JSON so the per-kernel rows can be read honestly.

Writes ROOFLINE_r05.json and prints the PERF.md table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

HBM_GBS = 819.0      # TPU v5e HBM bandwidth, GB/s (public spec)
VPU_GF = 3900.0      # f32 VPU ops/s upper bound (8x128 lanes * 4 ALUs * 0.94 GHz)


def timeit(fn, n=50):
    # close the async window with a ONE-ELEMENT fetch (slice on device):
    # fetching a whole output leaf over the axon tunnel costs ~ms/MB and
    # would smear into the per-call average
    r = fn()
    np.asarray(jax.tree.leaves(r)[0][:1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(jax.tree.leaves(r)[0][:1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def entry(name, ms, bytes_, flops, note):
    hbm_ms = bytes_ / (HBM_GBS * 1e9) * 1e3
    vpu_ms = flops / (VPU_GF * 1e9) * 1e3
    bound = max(hbm_ms, vpu_ms)
    which = "HBM" if hbm_ms >= vpu_ms else "VPU"
    return {
        "kernel": name,
        "measured_ms": round(ms, 3),
        "bytes_mb": round(bytes_ / 1e6, 1),
        "gflops": round(flops / 1e9, 2),
        "achieved_gbs": round(bytes_ / (ms * 1e-3) / 1e9, 1),
        "achieved_gflops_s": round(flops / (ms * 1e-3) / 1e9, 1),
        "bound_ms": round(bound, 3),
        "binding": which,
        "pct_of_light": round(100.0 * bound / ms, 1),
        "note": note,
    }


if __name__ == "__main__":
    import jax.numpy as jnp

    if jax.default_backend() in ("cpu", "gpu"):
        print("needs the TPU chip"); sys.exit(1)

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.ops.pallas_gather import gather_patches_pair
    from vloam_tpu.ops.pallas_gn import solve_pose_gn_lidar
    from vloam_tpu.ops.pallas_knn import TM, knn_lanemin_pair

    cfg = kitti_hdl64()
    rng = np.random.default_rng(0)
    rows = []

    # ---- 0. dispatch floor: an empty-ish jitted op under the same harness --
    tiny = jnp.zeros((8, 128), jnp.float32)
    empty_j = jax.jit(lambda x: x + 1.0)
    dispatch_floor_ms = timeit(lambda: empty_j(tiny)) * 1e3
    print(f"dispatch floor (empty jitted op): {dispatch_floor_ms:.3f} ms — "
          "measured_ms at/below this is an upper bound, not a kernel time; "
          "see tools/profile_trace.py for in-step device truth")

    # ---- 1. fused lane-min pair k-NN at the mapping correspondence shapes --
    Ma, Na = cfg.mapping.corner_stack_cap, cfg.mapping.submap_corner_cap
    Mb, Nb = cfg.mapping.surf_stack_cap, cfg.mapping.submap_surf_cap
    qa = jnp.array(rng.uniform(-60, 60, (Ma, 3)).astype(np.float32))
    ca = jnp.array(rng.uniform(-60, 60, (Na, 3)).astype(np.float32))
    qb = jnp.array(rng.uniform(-60, 60, (Mb, 3)).astype(np.float32))
    cb = jnp.array(rng.uniform(-60, 60, (Nb, 3)).astype(np.float32))
    pair_j = jax.jit(
        lambda a, b, c, d: knn_lanemin_pair(a, b, jnp.ones((Na,), bool), 5,
                                            c, d, jnp.ones((Nb,), bool), 5)
    )
    ms = timeit(lambda: pair_j(qa, ca, qb, cb)) * 1e3
    # bytes: candidate tiles re-stream once per query tile (revisited output
    # block, so outputs stay resident); queries once; epilogue reads (M,128)
    # keys and writes (M,k) pairs.
    bytes_ = (
        (Ma // TM) * Na * 12 + (Mb // TM) * Nb * 12     # candidate streams
        + (Ma + Mb) * 12                                # queries
        + (Ma + Mb) * 128 * 4                           # lane-key writes
        + (Ma + Mb) * (128 * 4 + 5 * 8)                 # epilogue r/w
    )
    # flops: per (query, candidate): 3 sub + 3 mul + 2 add = 8 f32 ops, plus
    # ~2 packed-min/select ops
    flops = (Ma * Na + Mb * Nb) * 10
    rows.append(entry(
        f"knn_lanemin_pair {Ma}x{Na}+{Mb}x{Nb}", ms, bytes_, flops,
        "no AABB pruning (worst case; production prunes empty tiles)",
    ))

    # ---- 2. patch gather at the KLT shapes --------------------------------
    H, W = cfg.visual.img_height, cfg.visual.img_width
    N, P = cfg.visual.max_features, 32
    img_a = jnp.array(rng.uniform(0, 255, (H, W)).astype(np.float32))
    img_b = jnp.array(rng.uniform(0, 255, (H, W)).astype(np.float32))
    corners = jnp.array(
        np.stack([rng.integers(0, W - P, N), rng.integers(0, H - P, N)], -1)
        .astype(np.int32)
    )
    gat_j = jax.jit(lambda a, b, c: gather_patches_pair(a, b, c, c, P))
    ms = timeit(lambda: gat_j(img_a, img_b, corners)) * 1e3
    # ideal bytes: each kernel instance DMAs a (P, 256)-wide aligned window
    # per keypoint per image (the lane-rotate trick needs 2 lane groups),
    # writes (P, P); ideal lower bound reads exactly (P, P).
    bytes_ideal = 2 * N * (P * P * 4 + P * P * 4)
    bytes_impl = 2 * N * (P * 256 * 4 + P * P * 4)
    flops = 2 * N * P * P * 2          # shift + select per element (~2 ops)
    e = entry(f"gather_patches_pair {N}x{P}x{P}", ms, bytes_impl, flops,
              "impl bytes (256-wide aligned DMA windows); ideal-bytes bound "
              f"would be {bytes_ideal / (HBM_GBS * 1e9) * 1e3:.3f} ms; "
              "measured_ms here is dispatch-bound (~= the floor above) — "
              "in-step device trace shows ~0.30 ms, and A/B experiments "
              "(tools/gather_experiments.py B9-B11 + grouped-DMA variants) "
              "found DMA count, bytes and row segments all non-binding at "
              "these shapes")
    rows.append(e)

    # ---- 3. fused GN solver at the mapping solve shapes -------------------
    Be, Bs = cfg.mapping.corner_stack_cap, cfg.mapping.surf_stack_cap
    p_e = rng.uniform(-40, 40, (Be, 3)).astype(np.float32)
    a_e = p_e + rng.normal(0, 0.1, (Be, 3)).astype(np.float32)
    b_e = p_e + rng.normal(0, 0.1, (Be, 3)).astype(np.float32)
    v_e = np.ones((Be,), bool)
    p_s = rng.uniform(-40, 40, (Bs, 3)).astype(np.float32)
    n_s = rng.normal(0, 1, (Bs, 3)).astype(np.float32)
    n_s /= np.linalg.norm(n_s, axis=1, keepdims=True)
    d_s = rng.uniform(-1, 1, (Bs,)).astype(np.float32)
    v_s = np.ones((Bs,), bool)
    pose0 = jnp.array([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    gn_j = jax.jit(
        lambda p, e, s: solve_pose_gn_lidar(p, e, s, 4, 0.1, 0.0)
    )
    args_e = tuple(map(jnp.array, (p_e, a_e, b_e, v_e)))
    args_s = tuple(map(jnp.array, (p_s, n_s, d_s, v_s)))
    ms = timeit(lambda: gn_j(pose0, args_e, args_s)) * 1e3
    # bytes: one pass over the packed rows (edge 4x3 + plane 2x3+2 f32 per
    # row + constants), all iterations in VMEM
    bytes_ = Be * 12 * 4 + Bs * 9 * 4 + 7 * 4 * 2
    # flops: ~180 ops per residual row per iteration (residual + analytic
    # 6-col Jacobian + JtJ rank-1 accumulation)
    flops = 4 * (Be + Bs) * 180
    rows.append(entry(f"solve_pose_gn_lidar {Be}e+{Bs}p x4it", ms, bytes_, flops,
                      "latency-floor candidate: single launch, tiny data"))

    print(f"{'kernel':44s} {'ms':>7s} {'GB/s':>7s} {'Gf/s':>8s} "
          f"{'bound':>7s} {'%SoL':>6s}")
    for r in rows:
        print(f"{r['kernel']:44s} {r['measured_ms']:7.3f} "
              f"{r['achieved_gbs']:7.1f} {r['achieved_gflops_s']:8.1f} "
              f"{r['binding']:>7s} {r['pct_of_light']:6.1f}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "ROOFLINE_r05.json")
    with open(out, "w") as f:
        json.dump({
            "hbm_gbs": HBM_GBS,
            "vpu_gflops": VPU_GF,
            "dispatch_floor_ms": round(dispatch_floor_ms, 3),
            "note": ("per-kernel measured_ms at/below dispatch_floor_ms is an "
                     "upper bound set by axon per-dispatch overhead, not a "
                     "device time; in-step truth comes from "
                     "tools/profile_trace.py (see in_step_trace_ms)"),
            "kernels": rows,
        }, f, indent=1)
    print("wrote", out)
