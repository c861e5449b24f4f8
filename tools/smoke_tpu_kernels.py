"""Hardware validation of the real Mosaic lowerings of every Pallas kernel.

The unit suite runs the kernels under pallas interpret mode on CPU (fast,
portable), which does NOT exercise Mosaic-specific constraints: f32 scalar
prefetch operands in SMEM, dynamic ``pltpu.roll`` lane shifts, whole-array
VMEM blocks, and the DMA pipelining in the patch gather.  This tool runs the
real lowering on the attached TPU and cross-checks against the pure-XLA
fallbacks.  Run it on any Pallas/TPU toolchain bump (advisor round-2 item).

Usage:  python tools/smoke_tpu_kernels.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() in ("cpu", "gpu"):
        print("SKIP: no TPU attached (backend=%s)" % jax.default_backend())
        return 0

    from vloam_tpu import geometry as geo
    from vloam_tpu.ops import lidar_factors
    from vloam_tpu.ops.gauss_newton import solve_pose_gn
    from vloam_tpu.ops.knn import knn
    from vloam_tpu.ops.pallas_gn import solve_pose_gn_lidar
    from vloam_tpu.ops.pallas_knn import knn_lanemin, knn_lanemin_pair

    rng = np.random.default_rng(0)
    failures = []

    def check(name, ok):
        print(("ok  " if ok else "FAIL") + f"  {name}")
        if not ok:
            failures.append(name)

    # --- knn_lanemin vs XLA knn -------------------------------------------
    q = jnp.array(rng.uniform(-20, 20, (512, 3)).astype(np.float32))
    c = jnp.array(rng.uniform(-20, 20, (2048, 3)).astype(np.float32))
    m = jnp.array(rng.uniform(size=2048) > 0.1)
    d2_t, idx_t = jax.jit(knn_lanemin, static_argnums=3)(q, c, m, 5)
    d2_r, _ = jax.jit(knn, static_argnums=3)(q, c, m, 5)
    # lane-class contract: nearest neighbour always exact; d2 may be
    # floor-rounded by 2^-14 relative (9 packed mantissa bits)
    nn_ok = np.allclose(np.asarray(d2_t[:, 0]), np.asarray(d2_r[:, 0]), rtol=2e-4)
    check("knn_lanemin nearest-1 agreement", bool(nn_ok))

    # --- knn_lanemin_pair (fused two-group kernel) ------------------------
    qb = jnp.array(rng.uniform(-20, 20, (1024, 3)).astype(np.float32))
    cb = jnp.array(rng.uniform(-20, 20, (4096, 3)).astype(np.float32))
    mb = jnp.array(rng.uniform(size=4096) > 0.1)
    (d2a, _), (d2b, _) = jax.jit(knn_lanemin_pair, static_argnums=(3, 7))(
        q, c, m, 5, qb, cb, mb, 5
    )
    d2b_r, _ = jax.jit(knn, static_argnums=3)(qb, cb, mb, 5)
    pair_ok = np.allclose(
        np.asarray(d2a[:, 0]), np.asarray(d2_r[:, 0]), rtol=2e-4
    ) and np.allclose(np.asarray(d2b[:, 0]), np.asarray(d2b_r[:, 0]), rtol=2e-4)
    check("knn_lanemin_pair nearest-1 agreement", bool(pair_ok))

    # --- fused GN solver vs XLA jacfwd path -------------------------------
    aa = rng.normal(0, 0.02, 3)
    pose_true = geo.pose_from_qt(
        geo.angle_axis_to_quat(jnp.array(aa, jnp.float32)),
        jnp.array(rng.normal(0, 0.3, 3), jnp.float32),
    )
    be, bs = 1024, 2048
    a = rng.uniform(-20, 20, (be, 3)).astype(np.float32)
    u = rng.normal(size=(be, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    on_line = a + rng.uniform(-2, 2, (be, 1)).astype(np.float32) * u
    p_e = geo.pose_apply(geo.pose_inverse(pose_true), jnp.array(on_line))
    a_e, b_e = jnp.array(a), jnp.array(a + u)
    v_e = jnp.ones((be,), bool)

    n = rng.normal(size=(bs, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.uniform(-5, 5, bs).astype(np.float32)
    basis = np.stack([np.roll(n, 1, -1) - n * np.sum(n * np.roll(n, 1, -1), -1, keepdims=True)], 1)[:, 0]
    basis /= np.linalg.norm(basis, axis=-1, keepdims=True)
    on_plane = -d[:, None] * n + rng.uniform(-2, 2, (bs, 1)).astype(np.float32) * basis
    p_s = geo.pose_apply(geo.pose_inverse(pose_true), jnp.array(on_plane))
    n_s, d_s = jnp.array(n), jnp.array(d)
    v_s = jnp.ones((bs,), bool)

    pose0 = geo.pose_identity()
    pose_pl = solve_pose_gn_lidar(
        pose0, (p_e, a_e, b_e, v_e), (p_s, n_s, d_s, v_s), 4, 0.1, 1e-4
    )

    def residuals(pose):
        r_e = lidar_factors.edge_residual(pose, p_e, a_e, b_e)
        r_s = lidar_factors.plane_residual(pose, p_s, n_s, d_s)
        return ((r_e, v_e), (r_s, v_s))

    pose_x = solve_pose_gn(residuals, pose0, 4, 0.1, 1e-4)
    err = float(jnp.max(jnp.abs(pose_pl - pose_x)))
    check(f"solve_pose_gn_lidar vs XLA (max |dpose| = {err:.2e})", err < 5e-3)

    # --- patch gather (DMA-pipelined) -------------------------------------
    try:
        from vloam_tpu.ops.pallas_gather import gather_patches

        img = jnp.array(rng.uniform(0, 255, (384, 1280)).astype(np.float32))
        corners = jnp.array(
            np.stack(
                [rng.integers(0, 1264, 256), rng.integers(0, 368, 256)], -1
            ).astype(np.int32)
        )
        patches = gather_patches(img, corners, P=16)
        u0, v0 = int(corners[0, 0]), int(corners[0, 1])
        ref = np.asarray(img)[v0 : v0 + 16, u0 : u0 + 16]
        g_ok = np.allclose(np.asarray(patches[0]), ref)
        check("gather_patches corner agreement", bool(g_ok))
    except Exception as e:  # gather signature drift — report, don't crash
        check(f"gather_patches ({type(e).__name__}: {e})", False)

    print(("PASS" if not failures else "FAIL") + f": {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
