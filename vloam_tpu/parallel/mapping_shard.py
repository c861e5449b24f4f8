"""Distributed scan-to-map registration: cube grid sharded over a mesh axis.

This is the capability the reference never had (single process, single
thread — SURVEY.md §2 "parallelism: none"): the 21x21x11 cube map and its
submap NN searches partition across devices.

Design (TPU-first, collectives over ICI):
  * Cube slot arrays shard along axis 0 ("map" axis).  Block-cyclic slot
    addressing already spreads any 5x5x3 submap window across shards almost
    uniformly (window slot ids are mod-grid, so consecutive cubes land on
    different shards) — every device does useful NN work every frame.
  * Per frame, each shard runs 5-NN for ALL query points against ITS OWN
    window cubes (the expensive part — MXU distance matmuls over the shard's
    candidate points), then one all_gather of the (M, 5) neighbour
    xyz+distance merges the per-shard top-5 into the global top-5.  The
    gathered tensor is ~M x 5 x 4 floats — tiny vs the candidate sets.
  * The line/plane fits and 6-DoF GN normal equations are replicated (they
    cost microseconds); cube insertion + re-voxelisation happen shard-locally
    (each shard keeps the points whose slot it owns).
  * Weak scaling: map capacity and NN work both scale with shard count;
    per-frame collective volume is constant.

The single-device ``mapping_step`` in models/laser_mapping.py remains the
reference implementation; ``sharded_mapping_step`` is its SPMD twin run
under ``shard_map`` (``dryrun_multichip`` in __graft_entry__.py validates
compile + execution on a virtual mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vloam_tpu import geometry as geo
from vloam_tpu.config import VloamConfig
from vloam_tpu.models.laser_mapping import (
    MapState,
    _refilter_cubes,
    _scatter_insert_pair,
    _submap_coords,
    coord_to_slot,
    cube_coord_of,
    fit_corner_lines,
    fit_surf_planes,
)
from vloam_tpu.ops import lidar_factors
from vloam_tpu.ops.gauss_newton import solve_pose_gn
from vloam_tpu.ops.knn import knn
from vloam_tpu.ops.voxel import voxel_downsample

_INF = jnp.float32(3.4e38)


def _local_window(state: MapState, coords, cfg, axis: str):
    """Gather this shard's portion of the submap window.

    Returns ((corner pts, mask), (surf pts, mask), local_slots) where
    local_slots holds nc_local (out of range -> dropped) for non-owned cubes.
    """
    nc_local = state.cube_pts.shape[0]        # inside shard_map: the local block
    dev = jax.lax.axis_index(axis)
    offset = dev * nc_local
    slots = coord_to_slot(coords, cfg) - offset            # (75,)
    own = (slots >= 0) & (slots < nc_local)
    slots_c = jnp.clip(slots, 0, nc_local - 1)
    fresh = jnp.all(jnp.take(state.cube_coord, slots_c, axis=0) == coords, axis=-1) & own

    from vloam_tpu.ops.knn import compact_rows

    mc = cfg.mapping
    sub = jnp.take(state.cube_pts, slots_c, axis=0)        # (75, capT, 4)
    c_counts = jnp.where(fresh, jnp.take(state.corner_cnt, slots_c), 0)
    s_counts = jnp.where(fresh, jnp.take(state.surf_cnt, slots_c), 0)
    # local shard holds ~1/S of the window points; same dense caps are safe
    c = compact_rows(sub[:, :mc.corner_cube_cap], c_counts, mc.submap_corner_cap)
    s = compact_rows(sub[:, mc.corner_cube_cap:], s_counts, mc.submap_surf_cap)
    return c, s, jnp.where(own, slots, nc_local)


def _global_knn(q, cand, cand_mask, k, axis: str):
    """Shard-local k-NN + all_gather merge -> global k-NN neighbours.

    Returns (nbr_xyz (M, k, 3), d2 (M, k)).  The collective payload is
    (n_shards, M, k, 4) — independent of candidate-set size.
    """
    d2_loc, idx_loc = knn(q, cand[:, :3], cand_mask, k)
    nbr_loc = jnp.take(cand[:, :3], idx_loc, axis=0)       # (M, k, 3)
    packed = jnp.concatenate([nbr_loc, d2_loc[..., None]], axis=-1)
    allp = jax.lax.all_gather(packed, axis)                # (S, M, k, 4)
    S = allp.shape[0]
    m = q.shape[0]
    allp = jnp.moveaxis(allp, 0, 1).reshape(m, S * k, 4)
    neg, sel = jax.lax.top_k(-allp[..., 3], k)
    nbr = jnp.take_along_axis(allp[..., :3], sel[..., None], axis=1)
    return nbr, -neg


def sharded_mapping_step(
    state: MapState,
    corner_in, corner_in_mask,
    surf_in, surf_in_mask,
    pose_wodom,
    cfg: VloamConfig,
    axis: str = "map",
):
    """SPMD twin of mapping_step; call inside shard_map with MapState cube
    arrays partitioned on axis 0 and all other inputs replicated."""
    mc = cfg.mapping
    pose0 = geo.pose_compose(state.wmap_wodom, pose_wodom)

    # inputs are ring/azimuth-ordered feature clouds -> run-merge, no sort
    corner_stack, cs_mask = voxel_downsample(
        corner_in, corner_in_mask, mc.line_resolution, mc.corner_stack_cap,
        max_grid=1024, presorted=True,
    )
    surf_stack, ss_mask = voxel_downsample(
        surf_in, surf_in_mask, mc.plane_resolution, mc.surf_stack_cap,
        max_grid=512, presorted=True,
    )

    center = cube_coord_of(geo.pose_t(pose0)[None, :], mc.cube_size)[0]
    coords = _submap_coords(center, cfg)
    (c_pts, c_mask), (s_pts, s_mask), local_slots = _local_window(state, coords, cfg, axis)

    n_corner = jax.lax.psum(jnp.sum(c_mask), axis)
    n_surf = jax.lax.psum(jnp.sum(s_mask), axis)
    enough = (n_corner > mc.min_map_corner) & (n_surf > mc.min_map_surf)

    def optimize(pose):
        for _ in range(mc.outer_iters):
            qc = geo.pose_apply(pose, corner_stack[:, :3])
            nbr_c, d2_c = _global_knn(qc, c_pts, c_mask, mc.n_neighbors, axis)
            p_e, a_e, b_e, v_e = fit_corner_lines(corner_stack, cs_mask, nbr_c, d2_c, cfg)

            qs = geo.pose_apply(pose, surf_stack[:, :3])
            nbr_s, d2_s = _global_knn(qs, s_pts, s_mask, mc.n_neighbors, axis)
            p_s, n_s, d_s, v_s = fit_surf_planes(surf_stack, ss_mask, nbr_s, d2_s, cfg)

            def residuals(p):
                return (
                    (lidar_factors.edge_residual(p, p_e, a_e, b_e), v_e),
                    (lidar_factors.plane_residual(p, p_s, n_s, d_s), v_s),
                )

            # Residuals are replicated after the gather; no psum needed.
            pose = solve_pose_gn(residuals, pose, mc.inner_iters, mc.huber_delta, mc.lm_lambda)
        return pose

    pose_w = jax.lax.cond(enough, optimize, lambda p: p, pose0)
    wmap_wodom = geo.pose_compose(pose_w, geo.pose_inverse(pose_wodom))

    # Shard-local insertion (+ global density gate / re-voxelisation).
    nc_local = state.cube_pts.shape[0]
    offset = jax.lax.axis_index(axis) * nc_local
    corner_w = corner_stack.at[:, :3].set(geo.pose_apply(pose_w, corner_stack[:, :3]))
    surf_w = surf_stack.at[:, :3].set(geo.pose_apply(pose_w, surf_stack[:, :3]))
    ins_c_mask, ins_s_mask = cs_mask, ss_mask
    if mc.insert_dedup:
        # local 1-NN then global min across shards (via the k=1 gather merge)
        _, d2c = _global_knn(corner_w[:, :3], c_pts, c_mask, 1, axis)
        _, d2s = _global_knn(surf_w[:, :3], s_pts, s_mask, 1, axis)
        ins_c_mask = cs_mask & (d2c[:, 0] > (mc.insert_dedup_factor * mc.line_resolution) ** 2)
        ins_s_mask = ss_mask & (d2s[:, 0] > (mc.insert_dedup_factor * mc.plane_resolution) ** 2)
    cube_arr, c_cnt, s_cnt, cube_coord, _, _ = _scatter_insert_pair(
        corner_w, ins_c_mask, surf_w, ins_s_mask,
        state.cube_pts, state.corner_cnt, state.surf_cnt, state.cube_coord,
        cfg, slot_offset=offset,
    )
    if not mc.insert_dedup:
        cube_arr, c_cnt, s_cnt = _refilter_cubes(cube_arr, c_cnt, s_cnt, local_slots, cfg)

    return MapState(
        cube_pts=cube_arr, corner_cnt=c_cnt, surf_cnt=s_cnt,
        cube_coord=cube_coord, pose_map=pose_w, wmap_wodom=wmap_wodom,
        initialized=jnp.array(True),
        # the compacted-submap cache is a single-device fast path; sharded
        # mapping re-gathers its local window every frame (cheap per shard)
        sub_c=state.sub_c, sub_c_n=state.sub_c_n,
        sub_s=state.sub_s, sub_s_n=state.sub_s_n, sub_center=state.sub_center,
    ), pose_w


def make_sharded_step(cfg: VloamConfig, mesh: Mesh, axis: str = "map"):
    """jit-compiled shard_map wrapper: (MapState, corner, cmask, surf, smask,
    pose) -> (MapState, pose_w) with cube arrays partitioned over ``axis``."""
    cube = P(axis)
    rep = P()
    state_specs = MapState(
        cube_pts=cube, corner_cnt=cube, surf_cnt=cube,
        cube_coord=cube, pose_map=rep, wmap_wodom=rep, initialized=rep,
        sub_c=rep, sub_c_n=rep, sub_s=rep, sub_s_n=rep, sub_center=rep,
    )

    @jax.jit
    def step(state, corner_in, cmask, surf_in, smask, pose_wodom):
        f = jax.shard_map(
            lambda st, ci, cm, si, sm, pw: sharded_mapping_step(st, ci, cm, si, sm, pw, cfg, axis),
            mesh=mesh,
            in_specs=(state_specs, rep, rep, rep, rep, rep),
            out_specs=(state_specs._replace(pose_map=rep, wmap_wodom=rep, initialized=rep), rep),
            check_vma=False,
        )
        return f(state, corner_in, cmask, surf_in, smask, pose_wodom)

    return step
