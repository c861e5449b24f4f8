"""LOAM feature extraction as fixed-shape, jit-once array programs.

Replaces the reference's ScanRegistration
(/root/reference/src/lidar_odometry_mapping/src/scan_registration.cpp:144-513):
NaN/min-range filtering, per-point ring ID from vertical angle, azimuth
relative-time, 11-point curvature, and the per-(ring x sector) greedy
edge/planar selection with +-5 neighbour suppression.

TPU re-design decisions:
  * The cloud lives on a dense ``(n_scans, ring_cap)`` grid — points keep
    their scan order inside each ring (one stable sort), so the curvature
    window and neighbour suppression become pure shifts along the ring axis.
  * The sequential "sort by curvature, pick greedily, suppress" loop becomes
    K masked-argmax rounds over all (ring, sector) cells at once — each round
    every sector picks its best eligible point and suppresses its reach.
    This preserves the reference's selection semantics (including the
    gap^2 > 0.05 suppression break) up to pick ordering across sector
    boundaries, which only matters within +-5 points of a boundary.
  * Selected indices land in fixed per-(ring, sector, round) slots, so the
    feature clouds have static shapes: sharp (R*S*2), less-sharp (R*S*20),
    flat (R*S*4), less-flat = voxel-downsampled remainder.

Feature points are (x, y, z, w) where w = ring + 0.1 * rel_time — the
reference's intensity encoding (scan_registration.cpp:294-297).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vloam_tpu.config import ScanConfig
from vloam_tpu.ops.voxel import voxel_downsample


class ScanFeatures(NamedTuple):
    """Fixed-shape feature clouds for one lidar frame (all xyzw)."""

    sharp: jax.Array          # (R*S*2, 4)
    sharp_mask: jax.Array     # (R*S*2,)
    less_sharp: jax.Array     # (R*S*20, 4)
    less_sharp_mask: jax.Array
    flat: jax.Array           # (R*S*4, 4)
    flat_mask: jax.Array
    less_flat: jax.Array      # (less_flat_cap, 4)
    less_flat_mask: jax.Array


def assign_rings(points: jax.Array, mask: jax.Array, cfg: ScanConfig) -> tuple[jax.Array, jax.Array]:
    """Vertical-angle -> ring ID per the reference's sensor formulas.

    Returns (ring (N,) int32, valid (N,) bool).  Semantics of
    scan_registration.cpp:217-254 (16/32/64-beam; C truncation-toward-zero).
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    horiz = jnp.sqrt(x * x + y * y)
    angle = jnp.degrees(jnp.arctan2(z, jnp.maximum(horiz, 1e-12)))

    if cfg.n_scans == 16:
        sid_f = (angle + 15.0) / 2.0 + 0.5
        sid = sid_f.astype(jnp.int32)  # trunc toward zero, like C int()
        ok = (sid >= 0) & (sid <= cfg.n_scans - 1)
    elif cfg.n_scans == 32:
        sid_f = (angle + 92.0 / 3.0) * 3.0 / 4.0
        sid = sid_f.astype(jnp.int32)
        ok = (sid >= 0) & (sid <= cfg.n_scans - 1)
    elif cfg.n_scans == 64:
        upper = ((2.0 - angle) * 3.0 + 0.5).astype(jnp.int32)
        lower = cfg.n_scans // 2 + ((-8.83 - angle) * 2.0 + 0.5).astype(jnp.int32)
        sid = jnp.where(angle >= -8.83, upper, lower)
        ok = (angle <= 2.0) & (angle >= -24.33) & (sid >= 0) & (sid <= 50)
    else:
        raise ValueError(f"unsupported n_scans={cfg.n_scans}")
    return sid, mask & ok


def relative_times(points: jax.Array, mask: jax.Array) -> jax.Array:
    """Azimuth-based intra-scan relative time in [0, 1].

    Vectorised version of the startOri/endOri unwrap
    (scan_registration.cpp:185-294): rel = ((-atan2(y,x)) - startOri) mod 2pi,
    normalised by the (~2pi) sweep.  Exact for KITTI's azimuth-ordered scans.
    """
    ori = -jnp.arctan2(points[:, 1], points[:, 0])
    n = points.shape[0]
    idx = jnp.arange(n)
    first = jnp.argmax(mask)                       # first valid index
    last = n - 1 - jnp.argmax(mask[::-1])          # last valid index
    start = ori[first]
    end = ori[last] + 2.0 * jnp.pi
    end = jnp.where(end - start > 3.0 * jnp.pi, end - 2.0 * jnp.pi,
                    jnp.where(end - start < jnp.pi, end + 2.0 * jnp.pi, end))
    sweep = jnp.maximum(end - start, 1e-6)
    rel = jnp.mod(ori - start, 2.0 * jnp.pi) / sweep
    del idx
    return jnp.clip(rel, 0.0, 1.0)


def organize_scan(
    points: jax.Array, mask: jax.Array, cfg: ScanConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Raw padded cloud -> dense ring grid.

    Returns (grid (R, C, 4) xyzw, grid_mask (R, C), n_per_ring (R,)).
    Points keep their original (scan) order within each ring; each ring's
    valid points occupy columns [0, n_r).
    """
    n = points.shape[0]
    r = jnp.sqrt(jnp.sum(points[:, :3] ** 2, axis=-1))
    mask = mask & (r >= cfg.minimum_range) & jnp.all(jnp.isfinite(points[:, :3]), axis=-1)

    ring, mask = assign_rings(points, mask, cfg)
    rel = relative_times(points, mask)
    w = ring.astype(jnp.float32) + cfg.scan_period * rel

    # Stable sort by ring groups points per ring in original order.
    ring_key = jnp.where(mask, ring, cfg.n_scans)  # invalid last
    order = jnp.argsort(ring_key, stable=True)
    ring_s = jnp.take(ring_key, order)
    pts_s = jnp.take(jnp.concatenate([points[:, :3], w[:, None]], axis=1), order, axis=0)
    msk_s = jnp.take(mask, order)

    # Rank within ring = index - start-of-ring.
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), ring_s[1:] != ring_s[:-1]])
    start_idx = jnp.where(is_start, idx, 0)
    ring_start = jax.lax.cummax(start_idx)
    rank = idx - ring_start

    ok = msk_s & (rank < cfg.ring_cap)
    flat_idx = jnp.where(ok, ring_s * cfg.ring_cap + rank, cfg.n_scans * cfg.ring_cap)
    grid = jnp.zeros((cfg.n_scans * cfg.ring_cap + 1, 4), jnp.float32).at[flat_idx].set(
        jnp.where(ok[:, None], pts_s, 0.0), mode="drop"
    )[:-1].reshape(cfg.n_scans, cfg.ring_cap, 4)
    gmask = jnp.zeros((cfg.n_scans * cfg.ring_cap + 1,), bool).at[flat_idx].set(ok, mode="drop")[:-1]
    gmask = gmask.reshape(cfg.n_scans, cfg.ring_cap)
    n_per_ring = jnp.sum(gmask, axis=1).astype(jnp.int32)
    return grid, gmask, n_per_ring


def ring_curvature(grid: jax.Array, n_per_ring: jax.Array, cfg: ScanConfig) -> tuple[jax.Array, jax.Array]:
    """11-point curvature per grid cell + selectability mask.

    curvature_i = || sum_{l=-5..5} p_{i+l} - 11 p_i ||^2 over in-ring
    neighbours (scan_registration.cpp:323-346); cells without 5 neighbours on
    both sides (the per-ring [start+5, end-6] margins) are unselectable.
    """
    xyz = grid[..., :3]
    w = cfg.curvature_window
    acc = -2.0 * w * xyz
    for l in range(1, w + 1):
        acc = acc + jnp.roll(xyz, l, axis=1) + jnp.roll(xyz, -l, axis=1)
    curv = jnp.sum(acc * acc, axis=-1)

    col = jnp.arange(grid.shape[1])[None, :]
    selectable = (col >= w) & (col <= n_per_ring[:, None] - w - 1)
    return curv, selectable


def _suppression_reach(grid: jax.Array, gmask: jax.Array, cfg: ScanConfig) -> tuple[jax.Array, jax.Array]:
    """Forward/backward suppression reach per cell.

    After picking point i the reference suppresses i+1..i+5 while consecutive
    gaps stay <= 0.05 (squared) and symmetrically backwards
    (scan_registration.cpp:406-429).  reach_fwd[i] = how many forward
    neighbours get suppressed; reach_bwd likewise.
    """
    xyz = grid[..., :3]
    nxt = jnp.roll(xyz, -1, axis=1)
    gap_ok = jnp.sum((nxt - xyz) ** 2, axis=-1) <= cfg.suppression_gap_sq  # gap between i and i+1
    gap_ok = gap_ok & gmask & jnp.roll(gmask, -1, axis=1)

    w = cfg.neighbor_suppression
    fwd = jnp.zeros(gap_ok.shape, jnp.int32)
    run = jnp.ones(gap_ok.shape, bool)
    for l in range(w):
        run = run & jnp.roll(gap_ok, -l, axis=1)
        fwd = fwd + run.astype(jnp.int32)
    prv_gap_ok = jnp.roll(gap_ok, 1, axis=1)  # gap between i-1 and i
    bwd = jnp.zeros(gap_ok.shape, jnp.int32)
    run = jnp.ones(gap_ok.shape, bool)
    for l in range(w):
        run = run & jnp.roll(prv_gap_ok, l, axis=1)
        bwd = bwd + run.astype(jnp.int32)
    return fwd, bwd


def extract_features(
    points: jax.Array, mask: jax.Array, cfg: ScanConfig
) -> ScanFeatures:
    """Full scan registration: raw padded cloud -> LOAM feature clouds."""
    grid, gmask, n_per_ring = organize_scan(points, mask, cfg)
    curv, selectable = ring_curvature(grid, n_per_ring, cfg)
    fwd, bwd = _suppression_reach(grid, gmask, cfg)

    R, C = gmask.shape
    S = cfg.n_sectors
    col = jnp.arange(C, dtype=jnp.int32)[None, :]

    # Sector id per cell: reference splits [start+5, end-6] into 6 equal index
    # ranges (scan_registration.cpp:358-361).  span = (end - start) indices.
    w = cfg.curvature_window
    span = jnp.maximum(n_per_ring[:, None] - 2 * w - 1, 1)  # scanEnd-scanStart
    sector = ((col - w) * S) // span
    sector = jnp.clip(sector, 0, S - 1)
    # Rings with < 6 usable points are skipped (scan_registration.cpp:355).
    ring_ok = (n_per_ring[:, None] - 2 * w - 1) >= 6
    selectable = selectable & gmask & ring_ok

    sector_oh = sector[:, None, :] == jnp.arange(S, dtype=jnp.int32)[None, :, None]  # (R, S, C)

    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)

    def pick_round(state, maximize, threshold_fn, n_rounds):
        """Run n_rounds of parallel per-sector greedy pick + suppression."""
        def body(t, carry):
            suppressed, slots, slot_valid = carry
            elig = selectable & ~suppressed & threshold_fn(curv)
            elig_s = elig[:, None, :] & sector_oh                      # (R,S,C)
            score = jnp.where(elig_s, curv[:, None, :], neg_inf if maximize else pos_inf)
            if maximize:
                i_sel = jnp.argmax(score, axis=-1)                     # (R,S)
                has = jnp.take_along_axis(score, i_sel[..., None], -1)[..., 0] > neg_inf
            else:
                i_sel = jnp.argmin(score, axis=-1)
                has = jnp.take_along_axis(score, i_sel[..., None], -1)[..., 0] < pos_inf

            f_sel = jnp.take_along_axis(fwd, i_sel, axis=1)            # (R,S) gather per ring
            b_sel = jnp.take_along_axis(bwd, i_sel, axis=1)
            within = (col[:, None, :] >= (i_sel - b_sel)[..., None]) & (
                col[:, None, :] <= (i_sel + f_sel)[..., None]
            )
            picked_cell = col[:, None, :] == i_sel[..., None]
            new_sup = jnp.any((within | picked_cell) & has[..., None], axis=1)
            slots = slots.at[:, :, t].set(i_sel)
            slot_valid = slot_valid.at[:, :, t].set(has)
            return suppressed | new_sup, slots, slot_valid

        suppressed = state
        slots = jnp.zeros((R, S, n_rounds), jnp.int32)
        slot_valid = jnp.zeros((R, S, n_rounds), bool)
        suppressed, slots, slot_valid = jax.lax.fori_loop(
            0, n_rounds, lambda t, c: body(t, c), (suppressed, slots, slot_valid)
        )
        return suppressed, slots, slot_valid

    suppressed0 = jnp.zeros((R, C), bool)
    edge_thr = cfg.edge_threshold
    surf_thr = cfg.surf_threshold

    suppressed1, edge_slots, edge_valid = pick_round(
        suppressed0, True, lambda c: c > edge_thr, cfg.max_less_sharp
    )
    _, flat_slots, flat_valid = pick_round(
        suppressed1, False, lambda c: c < surf_thr, cfg.max_flat
    )

    def gather_slots(slots, valid, k):
        idx = slots[:, :, :k].reshape(R, -1)                 # (R, S*k)
        v = valid[:, :, :k].reshape(R, -1)
        pts = jnp.take_along_axis(grid, idx[..., None], axis=1)
        pts = jnp.where(v[..., None], pts, 0.0)
        return pts.reshape(-1, 4), v.reshape(-1)

    sharp, sharp_mask = gather_slots(edge_slots, edge_valid, cfg.max_sharp)
    less_sharp, less_sharp_mask = gather_slots(edge_slots, edge_valid, cfg.max_less_sharp)
    flat, flat_mask = gather_slots(flat_slots, flat_valid, cfg.max_flat)

    # Less-flat: every valid point not labelled edge, voxel-downsampled per ring
    # (scan_registration.cpp:486-504).  Edge labels live in edge_slots.
    edge_lab = jnp.zeros((R, C + 1), bool).at[
        jnp.arange(R)[:, None], jnp.where(edge_valid, edge_slots, C).reshape(R, -1)
    ].set(True)[:, :C]
    lf_mask = gmask & ~edge_lab
    ring_id = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, C))
    less_flat, less_flat_mask = voxel_downsample(
        grid.reshape(-1, 4),
        lf_mask.reshape(-1),
        cfg.less_flat_voxel,
        cfg.less_flat_cap,
        group_key=ring_id.reshape(-1),
    )

    return ScanFeatures(
        sharp, sharp_mask, less_sharp, less_sharp_mask, flat, flat_mask, less_flat, less_flat_mask
    )
