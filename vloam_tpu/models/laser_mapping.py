"""Scan-to-map lidar odometry (MO) — reference: laser_mapping.cpp:212-814.

The reference keeps a 21x21x11 grid of unbounded point-cloud cubes and
physically shuffles 4851 shared_ptrs through six while-loops whenever the
robot nears a grid border (laser_mapping.cpp:252-444).  The TPU re-design
makes recentering free: cube slots are addressed **block-cyclically**
(slot = world_cube_coord mod grid_dims) and each slot remembers which world
cube it currently stores.  Moving on simply lets new world cubes lazily
evict stale slots — no data movement, no pointer shuffles, and the cube
arrays are flat fixed-shape tensors that shard across a device mesh along
the slot axis (see vloam_tpu.parallel).

Per frame: voxel-downsample the input features (laser_mapping.cpp:491-500),
gather the 5x5x3-cube submap by masked slot lookup (:448-485), associate
with blocked MXU 5-NN + closed-form 3x3 eigen/solve line & plane fits
(:545-699), run batched GN (2 outer x 4 inner, Huber 0.1, :526,712), update
the wmap_wodom correction (:147-151), then scatter the registered features
into their cubes and re-voxel-filter the submap window (:741-808).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vloam_tpu import geometry as geo
from vloam_tpu.config import VloamConfig
from vloam_tpu.ops import lidar_factors
from vloam_tpu.ops.gauss_newton import solve_pose_gn  # noqa: F401 (distributed path)
from vloam_tpu.ops.pallas_gn import solve_pose_gn_lidar
from vloam_tpu.ops.knn import knn, nn1
from vloam_tpu.ops.linalg3 import eigh3x3, solve3x3
from vloam_tpu.ops.voxel import voxel_downsample


class MapState(NamedTuple):
    corner_pts: jax.Array    # (n_cubes, corner_cap, 4)
    corner_cnt: jax.Array    # (n_cubes,) int32
    surf_pts: jax.Array      # (n_cubes, surf_cap, 4)
    surf_cnt: jax.Array      # (n_cubes,)
    cube_coord: jax.Array    # (n_cubes, 3) int32 — world cube coord stored in each slot
    pose_map: jax.Array      # (7,) world_T_curr after mapping
    wmap_wodom: jax.Array    # (7,) map-world_T_odom-world correction
    initialized: jax.Array   # () bool
    # Compacted-submap cache (single-device insert_dedup path): the gathered
    # 75-cube window only changes by this frame's inserts until the robot
    # crosses a cube boundary, so it is rebuilt from the cube arrays only
    # when sub_center changes and incrementally appended otherwise.
    sub_c: jax.Array         # (submap_corner_cap, 4)
    sub_c_n: jax.Array       # () int32 valid prefix
    sub_s: jax.Array         # (submap_surf_cap, 4)
    sub_s_n: jax.Array       # () int32
    sub_center: jax.Array    # (3,) int32 cube coord the cache was built around


def n_cubes(cfg: VloamConfig) -> int:
    mc = cfg.mapping
    return mc.grid_w * mc.grid_h * mc.grid_d


def init_map_state(cfg: VloamConfig, n_shards: int = 1) -> MapState:
    """``n_shards > 1`` pads the slot axis to a multiple of the shard count so
    the cube arrays partition evenly across a mesh axis (pad slots hold the
    never-matching sentinel coord and are never addressed)."""
    mc = cfg.mapping
    nc = n_cubes(cfg)
    nc = -(-nc // n_shards) * n_shards
    return MapState(
        corner_pts=jnp.zeros((nc, mc.corner_cube_cap, 4), jnp.float32),
        corner_cnt=jnp.zeros((nc,), jnp.int32),
        surf_pts=jnp.zeros((nc, mc.surf_cube_cap, 4), jnp.float32),
        surf_cnt=jnp.zeros((nc,), jnp.int32),
        cube_coord=jnp.full((nc, 3), jnp.iinfo(jnp.int32).min, jnp.int32),
        pose_map=geo.pose_identity(),
        wmap_wodom=geo.pose_identity(),
        initialized=jnp.array(False),
        sub_c=jnp.zeros((mc.submap_corner_cap, 4), jnp.float32),
        sub_c_n=jnp.array(0, jnp.int32),
        sub_s=jnp.zeros((mc.submap_surf_cap, 4), jnp.float32),
        sub_s_n=jnp.array(0, jnp.int32),
        sub_center=jnp.full((3,), jnp.iinfo(jnp.int32).min, jnp.int32),
    )


def cube_coord_of(points: jax.Array, cube_size: float) -> jax.Array:
    """World point -> integer cube coordinate (laser_mapping.cpp:747-756
    including the negative-rounding correction — this is plain floor)."""
    return jnp.floor((points + cube_size / 2.0) / cube_size).astype(jnp.int32)


def coord_to_slot(coord: jax.Array, cfg: VloamConfig) -> jax.Array:
    """Block-cyclic slot index for a world cube coordinate."""
    mc = cfg.mapping
    dims = jnp.array([mc.grid_w, mc.grid_h, mc.grid_d], jnp.int32)
    m = jnp.remainder(coord, dims)  # python-style mod: result in [0, dims)
    return m[..., 0] + mc.grid_w * m[..., 1] + mc.grid_w * mc.grid_h * m[..., 2]


def _submap_coords(center_coord: jax.Array, cfg: VloamConfig) -> jax.Array:
    """(75, 3) world cube coords of the 5x5x3 neighbourhood."""
    mc = cfg.mapping
    dx = jnp.arange(-mc.submap_rx, mc.submap_rx + 1)
    dy = jnp.arange(-mc.submap_rx, mc.submap_rx + 1)
    dz = jnp.arange(-mc.submap_rz, mc.submap_rz + 1)
    off = jnp.stack(jnp.meshgrid(dx, dy, dz, indexing="ij"), axis=-1).reshape(-1, 3)
    return center_coord[None, :] + off.astype(jnp.int32)


def _gather_submap(state: MapState, coords: jax.Array, cfg: VloamConfig):
    """Gather the neighbourhood cubes' points, compacted into dense buffers.

    Cube buffers are mostly padding (capacity >> typical occupancy after
    re-voxelisation); compacting before the NN matmuls shrinks the candidate
    axis ~5-20x (laser_mapping.cpp:479-485 concatenates the same way)."""
    from vloam_tpu.ops.knn import compact_rows

    slots = coord_to_slot(coords, cfg)                      # (75,)
    fresh = jnp.all(jnp.take(state.cube_coord, slots, axis=0) == coords, axis=-1)  # (75,)

    def grab(pts, cnt, out_cap):
        sub = jnp.take(pts, slots, axis=0)                  # (75, cap, 4)
        counts = jnp.where(fresh, jnp.take(cnt, slots), 0)
        return compact_rows(sub, counts, out_cap)

    c_pts, c_mask = grab(state.corner_pts, state.corner_cnt, cfg.mapping.submap_corner_cap)
    s_pts, s_mask = grab(state.surf_pts, state.surf_cnt, cfg.mapping.submap_surf_cap)
    return (c_pts, c_mask), (s_pts, s_mask), slots, fresh


def fit_corner_lines(stack, stack_mask, nbr, d2, cfg):
    """PCA line fit from gathered 5-NN neighbours (laser_mapping.cpp:557-604).
    nbr: (M, 5, 3) neighbour xyz; d2: (M, 5) their squared distances."""
    mc = cfg.mapping
    center = jnp.mean(nbr, axis=1)
    zm = nbr - center[:, None, :]
    cov = jnp.einsum("mki,mkj->mij", zm, zm)
    vals, vecs = eigh3x3(cov)
    direction = vecs[..., :, 2]                              # largest-eigval column
    is_line = vals[..., 2] > mc.eigen_ratio * vals[..., 1]
    valid = stack_mask & (d2[:, -1] < mc.neighbor_dist_sq) & is_line
    a = center + mc.line_span * direction
    b = center - mc.line_span * direction
    return stack[:, :3], a, b, valid


def fit_surf_planes(stack, stack_mask, nbr, d2, cfg):
    """Least-squares plane fit A n = -1 from 5-NN (laser_mapping.cpp:637-681)."""
    mc = cfg.mapping
    ata = jnp.einsum("mki,mkj->mij", nbr, nbr)
    atb = -jnp.sum(nbr, axis=1)
    nrm = solve3x3(ata, atb)                                 # (M, 3)
    inv_len = 1.0 / jnp.maximum(jnp.linalg.norm(nrm, axis=-1), 1e-10)
    d = inv_len                                              # negative_OA_dot_norm
    n_unit = nrm * inv_len[:, None]
    fit = jnp.abs(jnp.einsum("mki,mi->mk", nbr, n_unit) + d[:, None])
    plane_ok = jnp.all(fit <= mc.plane_fit_tol, axis=-1)
    valid = stack_mask & (d2[:, -1] < mc.neighbor_dist_sq) & plane_ok
    return stack[:, :3], n_unit, d, valid


def _corner_correspondences(pose, stack, stack_mask, cand, cand_mask, cfg,
                            cand_count=None, query_count=None):
    """5-NN + PCA line fit -> virtual edge endpoints (laser_mapping.cpp:545-604).

    Also returns the 1-NN squared distance (d2[:, 0]) so the insert-dedup
    gate can reuse it instead of paying another full distance pass."""
    q = geo.pose_apply(pose, stack[:, :3])
    d2, idx = knn(q, cand[:, :3], cand_mask, cfg.mapping.n_neighbors,
                  cand_count=cand_count, query_count=query_count)
    nbr = jnp.take(cand[:, :3], idx, axis=0)                # (M, 5, 3)
    return fit_corner_lines(stack, stack_mask, nbr, d2, cfg) + (d2[:, 0],)


def _surf_correspondences(pose, stack, stack_mask, cand, cand_mask, cfg,
                          cand_count=None, query_count=None):
    """5-NN + least-squares plane fit A n = -1 (laser_mapping.cpp:626-699)."""
    q = geo.pose_apply(pose, stack[:, :3])
    d2, idx = knn(q, cand[:, :3], cand_mask, cfg.mapping.n_neighbors,
                  cand_count=cand_count, query_count=query_count)
    nbr = jnp.take(cand[:, :3], idx, axis=0)                # (M, 5, 3)
    return fit_surf_planes(stack, stack_mask, nbr, d2, cfg) + (d2[:, 0],)


def _scatter_insert(pts_w, mask, state_pts, state_cnt, cube_coord, cap, cfg, slot_offset=0):
    """Append world-frame points into their cube slots (block-cyclic).

    Stale slots (holding an evicted world cube) are reset before appending.
    ``slot_offset`` shifts global slot ids into this shard's local range
    (points outside [0, nc) are dropped — they belong to another shard).
    Returns (pts, cnt, cube_coord, touched_slot_mask).
    """
    nc = state_pts.shape[0]
    coord = cube_coord_of(pts_w[:, :3], cfg.mapping.cube_size)
    slot = coord_to_slot(coord, cfg) - slot_offset
    mask = mask & (slot >= 0) & (slot < nc)
    slot = jnp.where(mask, slot, nc)                         # invalid -> scrap slot

    # Reset stale slots touched by this insertion.
    stored = jnp.take(cube_coord, jnp.minimum(slot, nc - 1), axis=0)
    stale = jnp.any(stored != coord, axis=-1) & mask
    touched = jnp.zeros((nc + 1,), bool).at[slot].set(mask, mode="drop")[:nc]
    cnt = jnp.where(
        jnp.zeros((nc + 1,), bool).at[slot].set(stale, mode="drop")[:nc], 0, state_cnt
    )
    new_coord = jnp.full((nc + 1, 3), jnp.iinfo(jnp.int32).min, jnp.int32).at[slot].set(
        coord, mode="drop"
    )[:nc]
    cube_coord = jnp.where(touched[:, None], new_coord, cube_coord)

    # Rank of each point within its slot (stable sort by slot).
    n = pts_w.shape[0]
    order = jnp.argsort(slot, stable=True)
    slot_s = jnp.take(slot, order)
    pts_s = jnp.take(pts_w, order, axis=0)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), slot_s[1:] != slot_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - seg_start

    dest_row = jnp.take(cnt, jnp.minimum(slot_s, nc - 1)) + rank
    ok = (slot_s < nc) & (dest_row < cap)
    # Rejected points scatter to distinct out-of-bounds rows (mode="drop"
    # discards them); scattering straight into the state buffer — instead of
    # a scrap-row concatenate — avoids two full copies of the ~quarter-GB
    # cube array and lets XLA update a donated buffer in place.
    flat = jnp.where(ok, slot_s * cap + dest_row, nc * cap + idx)
    pts_flat = state_pts.reshape(-1, 4).at[flat].set(
        pts_s, mode="drop", unique_indices=True
    )
    added = jax.ops.segment_sum(
        ok.astype(jnp.int32), jnp.minimum(slot_s, nc), num_segments=nc + 1,
        indices_are_sorted=True,
    )[:nc]
    accepted = jnp.zeros((n,), bool).at[order].set(ok)     # per-INPUT-point landed flag
    return pts_flat.reshape(nc, cap, 4), cnt + added, cube_coord, touched, accepted


def _refilter_cubes(pts, cnt, slots, leaf, cap, cfg):
    """Re-voxel-downsample the submap-window cubes (laser_mapping.cpp:793-808).

    Out-of-range slot ids (another shard's cubes, in the distributed path)
    are gathered clipped and dropped on scatter-back."""
    nc = pts.shape[0]
    slots_c = jnp.clip(slots, 0, nc - 1)
    sub = jnp.take(pts, slots_c, axis=0)                     # (75, cap, 4)
    col = jnp.arange(cap)[None, :]
    m = col < jnp.take(cnt, slots_c)[:, None]

    def one(p, mm):
        return voxel_downsample(p, mm, leaf, cap, max_grid=256)

    newp, newm = jax.vmap(one)(sub, m)
    newc = jnp.sum(newm, axis=1).astype(jnp.int32)
    # scatter back (slots unique inside the window; duplicates impossible mod-grid
    # because the window is smaller than the grid in every axis)
    pts = pts.at[slots].set(jnp.where(newm[..., None], newp, 0.0), mode="drop")
    cnt = cnt.at[slots].set(newc, mode="drop")
    return pts, cnt


def mapping_step(
    state: MapState,
    corner_in: jax.Array, corner_in_mask: jax.Array,   # LO less-sharp cloud (xyzw)
    surf_in: jax.Array, surf_in_mask: jax.Array,       # LO less-flat cloud (xyzw)
    pose_wodom: jax.Array,                             # LO world pose (7,)
    cfg: VloamConfig,
) -> tuple[MapState, jax.Array]:
    """One mapping frame.  Returns (new_state, world pose after mapping)."""
    mc = cfg.mapping

    # Initial guess: wmap_wodom o wodom_curr (laser_mapping.cpp:204-208).
    pose0 = geo.pose_compose(state.wmap_wodom, pose_wodom)

    # Downsample input features (laser_mapping.cpp:491-500).
    # inputs are ring/azimuth-ordered feature clouds -> run-merge, no sort
    corner_stack, cs_mask = voxel_downsample(
        corner_in, corner_in_mask, mc.line_resolution, mc.corner_stack_cap,
        max_grid=1024, presorted=True,
    )
    surf_stack, ss_mask = voxel_downsample(
        surf_in, surf_in_mask, mc.plane_resolution, mc.surf_stack_cap,
        max_grid=512, presorted=True,
    )
    # Morton-sort the stacks: ring/azimuth order sweeps the whole 360° scan,
    # so a 256-row query block would span the scene and defeat the AABB tile
    # pruning inside the 5-NN kernel.  Sorting by local coords keeps world
    # blocks equally compact (rigid transform), and the order is irrelevant
    # to fits / GN / inserts (only f32 summation order shifts, sub-mm).
    # TPU-only: the CPU/GPU fallback k-NN does no tile pruning, so sorting
    # there would only perturb the reference-exact test numerics.
    _tpu = jax.default_backend() not in ("cpu", "gpu")
    if _tpu:
        from vloam_tpu.ops.knn import morton_sort

        corner_stack, cs_mask = morton_sort(corner_stack, cs_mask, cell=2.0)
        surf_stack, ss_mask = morton_sort(surf_stack, ss_mask, cell=2.0)

    center = cube_coord_of(geo.pose_t(pose0)[None, :], mc.cube_size)[0]
    coords = _submap_coords(center, cfg)

    if mc.insert_dedup:
        # Compacted-submap cache: the gathered window only changes by this
        # frame's inserts until the robot crosses a cube boundary (~50 m), so
        # the expensive gather+compact runs ~once per 50 frames (lax.cond)
        # and inserts are appended to the cache below.
        def rebuild(_):
            (cp, cm), (sp, sm), _, _ = _gather_submap(state, coords, cfg)
            if jax.default_backend() not in ("cpu", "gpu"):
                # Morton-sort the rebuilt cache (world coords, around the
                # window centre) so candidate tiles are compact for AABB
                # pruning; the per-frame appended tail is naturally local
                # (points near the current pose) and needs no re-sort.
                from vloam_tpu.ops.knn import morton_sort

                org = (center.astype(jnp.float32) * mc.cube_size)[None, :]
                cp, cm = morton_sort(cp, cm, cell=4.0, origin=org)
                sp, sm = morton_sort(sp, sm, cell=4.0, origin=org)
            return cp, jnp.sum(cm).astype(jnp.int32), sp, jnp.sum(sm).astype(jnp.int32)

        def cached(_):
            return state.sub_c, state.sub_c_n, state.sub_s, state.sub_s_n

        need_rebuild = jnp.any(center != state.sub_center)
        c_pts, c_n, s_pts, s_n = jax.lax.cond(need_rebuild, rebuild, cached, None)
        c_mask = jnp.arange(c_pts.shape[0]) < c_n
        s_mask = jnp.arange(s_pts.shape[0]) < s_n
        slots = None
    else:
        (c_pts, c_mask), (s_pts, s_mask), slots, fresh = _gather_submap(state, coords, cfg)
        c_n = jnp.sum(c_mask).astype(jnp.int32)
        s_n = jnp.sum(s_mask).astype(jnp.int32)

    enough = (c_n > mc.min_map_corner) & (s_n > mc.min_map_surf)

    inf = jnp.float32(3.4e38)
    # Dynamic valid-prefix lengths: the pallas knn skips tiles past these,
    # so association cost tracks live submap/stack occupancy, not capacity.
    cs_n = jnp.sum(cs_mask, dtype=jnp.int32)
    ss_n = jnp.sum(ss_mask, dtype=jnp.int32)

    def optimize(pose):
        from vloam_tpu.ops.pallas_knn import knn_lanemin_pair

        for _ in range(mc.outer_iters):
            # ONE fused kernel launch + epilogue for both 5-NN problems
            # (corner stack vs corner submap, surf stack vs surf submap)
            qc = geo.pose_apply(pose, corner_stack[:, :3])
            qs = geo.pose_apply(pose, surf_stack[:, :3])
            # Radius-clamped search: every consumer gates at
            # neighbor_dist_sq (fits) or the smaller insert-dedup radius, so
            # AABB-pruning tiles beyond sqrt(neighbor_dist_sq) is exact.
            r_prune = float(mc.neighbor_dist_sq) ** 0.5 * 1.001
            (d2c, idxc), (d2s, idxs) = knn_lanemin_pair(
                qc, c_pts[:, :3], c_mask, mc.n_neighbors,
                qs, s_pts[:, :3], s_mask, mc.n_neighbors,
                a_counts=(cs_n, c_n), b_counts=(ss_n, s_n),
                prune_radius=(r_prune, r_prune),
            )
            nbr_c = jnp.take(c_pts[:, :3], idxc, axis=0)
            p_e, a_e, b_e, v_e = fit_corner_lines(corner_stack, cs_mask, nbr_c, d2c, cfg)
            nn_c = d2c[:, 0]
            nbr_s = jnp.take(s_pts[:, :3], idxs, axis=0)
            p_s, n_s, d_s, v_s = fit_surf_planes(surf_stack, ss_mask, nbr_s, d2s, cfg)
            nn_s = d2s[:, 0]

            # All 4 inner iterations fuse into ONE Pallas launch on TPU
            # (analytic Jacobians + in-kernel 6x6 solves); solve_pose_gn is
            # the CPU fallback inside solve_pose_gn_lidar.
            pose = solve_pose_gn_lidar(
                pose, (p_e, a_e, b_e, v_e), (p_s, n_s, d_s, v_s),
                mc.inner_iters, mc.huber_delta, mc.lm_lambda,
            )
        return pose, nn_c, nn_s

    pose_w, nn_c, nn_s = jax.lax.cond(
        enough,
        optimize,
        lambda p: (p, jnp.full(corner_stack.shape[:1], inf), jnp.full(surf_stack.shape[:1], inf)),
        pose0,
    )

    # transformUpdate (laser_mapping.cpp:147-151).
    wmap_wodom = geo.pose_compose(pose_w, geo.pose_inverse(pose_wodom))

    # Insert registered features into cubes (laser_mapping.cpp:741-788).
    corner_w = corner_stack.at[:, :3].set(geo.pose_apply(pose_w, corner_stack[:, :3]))
    surf_w = surf_stack.at[:, :3].set(geo.pose_apply(pose_w, surf_stack[:, :3]))
    ins_c_mask, ins_s_mask = cs_mask, ss_mask
    if mc.insert_dedup:
        # Density gate replacing the per-frame window re-voxelisation
        # (laser_mapping.cpp:793-808): a registered point enters the map only
        # if no existing map point lies within half a voxel of it.  The 1-NN
        # distances are reused from the final association pass — they are
        # evaluated one GN solve before pose_w, a sub-cm pose difference that
        # is negligible against the 0.2-0.4 m gate radius, and reusing them
        # saves a full (M, N) distance pass per feature type.
        ins_c_mask = cs_mask & (nn_c > (mc.insert_dedup_factor * mc.line_resolution) ** 2)
        ins_s_mask = ss_mask & (nn_s > (mc.insert_dedup_factor * mc.plane_resolution) ** 2)
    c_arr, c_cnt, cube_coord, _, acc_c = _scatter_insert(
        corner_w, ins_c_mask, state.corner_pts, state.corner_cnt, state.cube_coord,
        mc.corner_cube_cap, cfg,
    )
    s_arr, s_cnt, cube_coord, _, acc_s = _scatter_insert(
        surf_w, ins_s_mask, state.surf_pts, state.surf_cnt, cube_coord,
        mc.surf_cube_cap, cfg,
    )

    if mc.insert_dedup:
        # Append this frame's accepted in-window points to the submap cache so
        # it stays exactly the set a fresh gather would produce.
        radii = jnp.array([mc.submap_rx, mc.submap_rx, mc.submap_rz], jnp.int32)

        def in_window(pts_w):
            cc = cube_coord_of(pts_w[:, :3], mc.cube_size)
            return jnp.all(jnp.abs(cc - center[None, :]) <= radii[None, :], axis=-1)

        def append(buf, n, pts_w, m):
            cap = buf.shape[0]
            rank = jnp.cumsum(m.astype(jnp.int32)) - m.astype(jnp.int32)
            # distinct out-of-bounds rows for rejects (dropped by mode="drop")
            dest = jnp.where(m & (n + rank < cap), n + rank,
                             cap + jnp.arange(m.shape[0], dtype=jnp.int32))
            buf = buf.at[dest].set(pts_w, mode="drop", unique_indices=True)
            return buf, jnp.minimum(n + jnp.sum(m, dtype=jnp.int32), cap)

        sub_c, sub_c_n = append(c_pts, c_n, corner_w, acc_c & in_window(corner_w))
        sub_s, sub_s_n = append(s_pts, s_n, surf_w, acc_s & in_window(surf_w))
        sub_center = center
    else:
        # Reference-exact path: re-voxelise the submap window each frame.
        c_arr, c_cnt = _refilter_cubes(c_arr, c_cnt, slots, mc.line_resolution,
                                       mc.corner_cube_cap, cfg)
        s_arr, s_cnt = _refilter_cubes(s_arr, s_cnt, slots, mc.plane_resolution,
                                       mc.surf_cube_cap, cfg)
        sub_c, sub_c_n, sub_s, sub_s_n = state.sub_c, state.sub_c_n, state.sub_s, state.sub_s_n
        sub_center = state.sub_center

    return MapState(
        corner_pts=c_arr, corner_cnt=c_cnt, surf_pts=s_arr, surf_cnt=s_cnt,
        cube_coord=cube_coord, pose_map=pose_w, wmap_wodom=wmap_wodom,
        initialized=jnp.array(True),
        sub_c=sub_c, sub_c_n=sub_c_n, sub_s=sub_s, sub_s_n=sub_s_n,
        sub_center=sub_center,
    ), pose_w
