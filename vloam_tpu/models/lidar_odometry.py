"""Scan-to-scan lidar odometry (LO) — reference: laser_odometry.cpp:199-584.

TPU re-design: the per-point kd-tree queries + ring-window scans of the
reference become two masked-argmin sweeps over an MXU distance matrix —
the ring constraint (NEARBY_SCAN, laser_odometry.h:94-95) is just another
mask on the candidate axis.  Correspondences are re-built twice (the outer
iterations at laser_odometry.cpp:224) and each association feeds a batched
Gauss-Newton solve (4 inner iterations, Huber 0.1 — the Ceres settings at
laser_odometry.cpp:229-234,500-509).  Everything is fixed-shape and jits
once; the frame loop threads a small pytree of last-frame feature clouds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vloam_tpu import geometry as geo
from vloam_tpu.config import VloamConfig
from vloam_tpu.ops import lidar_factors
from vloam_tpu.ops.gauss_newton import solve_pose_gn
from vloam_tpu.ops.knn import masked_argmin, pairwise_sqdist
from vloam_tpu.ops.scan_registration import ScanFeatures

_INF = jnp.float32(3.4e38)


class LoState(NamedTuple):
    last_corner: jax.Array        # (N_c, 4) xyzw — prev frame's less-sharp cloud
    last_corner_mask: jax.Array   # (N_c,)
    last_surf: jax.Array          # (N_s, 4) — prev frame's less-flat cloud
    last_surf_mask: jax.Array
    pose_wodom: jax.Array         # (7,) accumulated odometry-world pose
    last_delta: jax.Array         # (7,) previous frame-to-frame solution (warm start)
    initialized: jax.Array        # () bool


def init_lo_state(cfg: VloamConfig) -> LoState:
    sc = cfg.scan
    n_c = sc.n_scans * sc.n_sectors * sc.max_less_sharp
    n_s = sc.less_flat_cap
    return LoState(
        last_corner=jnp.zeros((n_c, 4), jnp.float32),
        last_corner_mask=jnp.zeros((n_c,), bool),
        last_surf=jnp.zeros((n_s, 4), jnp.float32),
        last_surf_mask=jnp.zeros((n_s,), bool),
        pose_wodom=geo.pose_identity(),
        last_delta=geo.pose_identity(),
        initialized=jnp.array(False),
    )


def _edge_correspondences(pose, sharp, sharp_mask, cand, cand_mask, cfg):
    """Point-to-line data: for each sharp point, closest cand + nearest
    cand on a different-but-nearby ring (laser_odometry.cpp:282-356)."""
    oc = cfg.odom
    q = geo.pose_apply(pose, sharp[:, :3])
    d2 = pairwise_sqdist(q, cand[:, :3])                      # (M, N)
    d2 = jnp.where(cand_mask[None, :], d2, _INF)

    d2_1, j1 = masked_argmin(d2, cand_mask[None, :])
    ring_c = jnp.floor(cand[:, 3]).astype(jnp.int32)
    ring_j = jnp.take(ring_c, j1)

    near = jnp.abs(ring_c[None, :].astype(jnp.float32) - ring_j[:, None].astype(jnp.float32)) <= oc.nearby_scan
    other = ring_c[None, :] != ring_j[:, None]
    d2_2, j2 = masked_argmin(d2, cand_mask[None, :] & near & other)

    valid = sharp_mask & (d2_1 < oc.distance_sq_threshold) & (d2_2 < oc.distance_sq_threshold)
    a = jnp.take(cand[:, :3], j1, axis=0)
    b = jnp.take(cand[:, :3], j2, axis=0)
    return sharp[:, :3], a, b, valid


def _plane_correspondences(pose, flat, flat_mask, cand, cand_mask, cfg, block: int = 8192):
    """Point-to-plane data: closest cand j, nearest same-ring cand l (!= j),
    nearest nearby-other-ring cand m (laser_odometry.cpp:387-459).

    Blocked over the candidate axis so the (M, N) distance matrix never
    materialises for the large less-flat cloud.
    """
    oc = cfg.odom
    m = flat.shape[0]
    n = cand.shape[0]
    assert n % block == 0
    q = geo.pose_apply(pose, flat[:, :3])
    ring_c = jnp.floor(cand[:, 3]).astype(jnp.int32)

    def sweep(extra_mask_fn, carry_init, nbest):
        """Generic blocked multi-argmin; extra_mask_fn(ring_b, idx_b) -> list of (M, B) masks."""
        cand_b = cand[:, :3].reshape(n // block, block, 3)
        maskc_b = cand_mask.reshape(n // block, block)
        ring_b = ring_c.reshape(n // block, block)

        def step(carry, inp):
            cb, mb, rb, bidx = inp
            d2 = pairwise_sqdist(q, cb)
            idx_b = bidx * block + jnp.arange(block, dtype=jnp.int32)[None, :]
            masks = extra_mask_fn(rb, idx_b)
            out = []
            for (bd, bi), extra in zip(carry, masks):
                d2m = jnp.where(mb[None, :] & extra, d2, _INF)
                dmin, jmin = masked_argmin(d2m, jnp.ones_like(d2m, bool))
                take = dmin < bd
                out.append((jnp.where(take, dmin, bd),
                            jnp.where(take, bidx * block + jmin, bi)))
            return tuple(out), None

        carry, _ = jax.lax.scan(
            step,
            carry_init,
            (cand_b, maskc_b, ring_b, jnp.arange(n // block, dtype=jnp.int32)),
        )
        return carry

    # pass 1: unconstrained closest
    ((d2_1, j1),) = sweep(
        lambda rb, ib: [jnp.ones((m, block), bool)],
        ((jnp.full((m,), _INF), jnp.zeros((m,), jnp.int32)),),
        1,
    )
    ring_j = jnp.take(ring_c, j1)

    # pass 2: same-ring (excluding j) and nearby-other-ring minima
    def masks2(rb, ib):
        same = (rb[None, :] == ring_j[:, None]) & (ib != j1[:, None])
        nearby_other = (rb[None, :] != ring_j[:, None]) & (
            jnp.abs(rb[None, :].astype(jnp.float32) - ring_j[:, None].astype(jnp.float32)) <= oc.nearby_scan
        )
        return [same, nearby_other]

    (d2_2, j2), (d2_3, j3) = sweep(
        masks2,
        (
            (jnp.full((m,), _INF), jnp.zeros((m,), jnp.int32)),
            (jnp.full((m,), _INF), jnp.zeros((m,), jnp.int32)),
        ),
        2,
    )

    thr = oc.distance_sq_threshold
    valid = flat_mask & (d2_1 < thr) & (d2_2 < thr) & (d2_3 < thr)
    pj = jnp.take(cand[:, :3], j1, axis=0)
    pl = jnp.take(cand[:, :3], j2, axis=0)
    pm = jnp.take(cand[:, :3], j3, axis=0)
    nrm, d = lidar_factors.plane_from_three_points(pj, pl, pm)
    # Degenerate normals (colinear triples) are rejected by zeroing validity.
    ok_n = jnp.linalg.norm(jnp.cross(pj - pl, pj - pm), axis=-1) > 1e-10
    return flat[:, :3], nrm, d, valid & ok_n


def lo_step(
    state: LoState, feats: ScanFeatures, cfg: VloamConfig, vo_prior: jax.Array | None = None
) -> tuple[LoState, jax.Array, jax.Array]:
    """One LO frame.  Returns (new_state, f2f pose last_T_curr, world pose).

    ``vo_prior`` (a 7-pose, velodyne frame, last_T_curr) seeds the solve when
    the VO/LO coupling is on (laser_odometry.cpp:237-250); otherwise the
    previous solution warm-starts it (Ceres reuses para_q/para_t across
    frames).
    """
    oc = cfg.odom

    pose0 = state.last_delta if vo_prior is None else vo_prior

    def solve(pose_init):
        pose = pose_init
        for _ in range(oc.outer_iters):
            p_e, a_e, b_e, v_e = _edge_correspondences(
                pose, feats.sharp, feats.sharp_mask, state.last_corner, state.last_corner_mask, cfg
            )
            p_s, n_s, d_s, v_s = _plane_correspondences(
                pose, feats.flat, feats.flat_mask, state.last_surf, state.last_surf_mask, cfg
            )

            def residuals(p):
                return (
                    (lidar_factors.edge_residual(p, p_e, a_e, b_e), v_e),
                    (lidar_factors.plane_residual(p, p_s, n_s, d_s), v_s),
                )

            pose = solve_pose_gn(residuals, pose, oc.inner_iters, oc.huber_delta, oc.lm_lambda)
        return pose

    delta = jax.lax.cond(
        state.initialized,
        solve,
        lambda p: geo.pose_identity(),
        pose0,
    )

    pose_w = geo.pose_compose(state.pose_wodom, delta)
    pose_w = jnp.where(state.initialized, pose_w, state.pose_wodom)

    new_state = LoState(
        last_corner=feats.less_sharp,
        last_corner_mask=feats.less_sharp_mask,
        last_surf=feats.less_flat,
        last_surf_mask=feats.less_flat_mask,
        pose_wodom=pose_w,
        last_delta=jnp.where(state.initialized, delta, state.last_delta),
        initialized=jnp.array(True),
    )
    return new_state, delta, pose_w
