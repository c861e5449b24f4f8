"""Sliding-window pose-graph optimisation — the backend the reference lacks.

The reference chains frame-to-frame/-to-map solves and never revisits past
poses (SURVEY.md §2: no BA, no loop closures).  This module adds a batched
Gauss-Newton pose-graph solver over a window of keyframe poses with
relative-pose factors (odometry links, mapping links, loop closures):

  r_ij = [ log_q( zq_ij^-1 (x) (q_i^-1 (x) q_j) ),  R_i^T (t_j - t_i) - zt_ij ]

All factor residuals/Jacobians evaluate in one vmap; the normal equations
assemble by scatter-add into the (6W, 6W) block system and solve densely
(W is a sliding window, tens of poses).  With ``axis_name`` the factor set
shards across a device mesh and JtJ/Jtr psum over ICI — the distributed-BA
reduction pattern (the Schur trick is unnecessary landmark-free, the pose
system *is* the reduced system).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vloam_tpu import geometry as geo


class PoseGraphFactors(NamedTuple):
    i: jax.Array        # (F,) int32 source pose index
    j: jax.Array        # (F,) int32 target pose index
    z: jax.Array        # (F, 7) measured i_T_j (maps j-frame points into i-frame)
    weight: jax.Array   # (F,) scalar information weight
    valid: jax.Array    # (F,) bool


def relative_pose_residual(pose_i: jax.Array, pose_j: jax.Array, z: jax.Array) -> jax.Array:
    """(6,) residual of one factor."""
    rel = geo.pose_compose(geo.pose_inverse(pose_i), pose_j)
    dq = geo.quat_mul(geo.quat_conj(z[:4]), rel[:4])
    r_rot = geo.quat_to_angle_axis(dq)
    r_t = rel[4:] - z[4:]
    return jnp.concatenate([r_rot, r_t])


def optimize_pose_graph(
    poses: jax.Array,            # (W, 7)
    factors: PoseGraphFactors,
    iters: int = 5,
    lm_lambda: float = 1e-5,
    huber_delta: float = 0.5,
    axis_name: str | None = None,
) -> jax.Array:
    """GN/LM over the window; pose 0 is gauge-fixed with a strong prior."""
    W = poses.shape[0]
    D = 6 * W

    def gn_iter(_, poses):
        def factor_res(delta_i, delta_j, pi, pj, z):
            return relative_pose_residual(
                _plus(pi, delta_i), _plus(pj, delta_j), z
            )

        def _plus(p, d):
            dq = geo.angle_axis_to_quat(d[:3])
            return geo.pose_from_qt(
                geo.quat_normalize(geo.quat_mul(dq, p[:4])), p[4:] + d[3:]
            )

        def one_factor(i, j, z, wgt, valid):
            pi = poses[i]
            pj = poses[j]

            def local(d):
                r = factor_res(d[:6], d[6:], pi, pj, z)
                return r, r

            Jf, r = jax.jacfwd(local, has_aux=True)(jnp.zeros(12, poses.dtype))
            sq = jnp.sum(r * r)
            w = jnp.where(sq > huber_delta**2, huber_delta / jnp.sqrt(sq + 1e-12), 1.0)
            w = w * wgt * valid.astype(poses.dtype)
            return Jf * w, r * w   # (6, 12), (6,)

        Jf, rf = jax.vmap(one_factor)(
            factors.i, factors.j, factors.z, factors.weight, factors.valid
        )  # (F, 6, 12), (F, 6)

        Ji = Jf[:, :, :6]
        Jj = Jf[:, :, 6:]
        jtj_ii = jnp.einsum("fri,frj->fij", Ji, Ji)
        jtj_ij = jnp.einsum("fri,frj->fij", Ji, Jj)
        jtj_jj = jnp.einsum("fri,frj->fij", Jj, Jj)
        jtr_i = jnp.einsum("fri,fr->fi", Ji, rf)
        jtr_j = jnp.einsum("fri,fr->fi", Jj, rf)

        JtJ = jnp.zeros((W, W, 6, 6), poses.dtype)
        JtJ = JtJ.at[factors.i, factors.i].add(jtj_ii)
        JtJ = JtJ.at[factors.i, factors.j].add(jtj_ij)
        JtJ = JtJ.at[factors.j, factors.i].add(jnp.swapaxes(jtj_ij, -1, -2))
        JtJ = JtJ.at[factors.j, factors.j].add(jtj_jj)
        Jtr = jnp.zeros((W, 6), poses.dtype)
        Jtr = Jtr.at[factors.i].add(jtr_i)
        Jtr = Jtr.at[factors.j].add(jtr_j)

        if axis_name is not None:
            JtJ = jax.lax.psum(JtJ, axis_name)
            Jtr = jax.lax.psum(Jtr, axis_name)

        A = JtJ.transpose(0, 2, 1, 3).reshape(D, D)
        b = Jtr.reshape(D)
        # gauge prior on pose 0
        A = A + jnp.diag(
            jnp.concatenate([jnp.full(6, 1e6), jnp.zeros(D - 6)]).astype(poses.dtype)
        )
        A = A + jnp.diag(lm_lambda * jnp.diagonal(A) + 1e-8)
        delta = jnp.linalg.solve(A, -b).reshape(W, 6)
        return jax.vmap(_plus)(poses, delta)

    return jax.lax.fori_loop(0, iters, gn_iter, poses)


def odometry_factors(deltas: jax.Array, weight: float = 1.0) -> PoseGraphFactors:
    """Chain factors from frame-to-frame deltas: z_k = k_T_{k+1}."""
    F = deltas.shape[0]
    return PoseGraphFactors(
        i=jnp.arange(F, dtype=jnp.int32),
        j=jnp.arange(1, F + 1, dtype=jnp.int32),
        z=deltas,
        weight=jnp.full((F,), weight, jnp.float32),
        valid=jnp.ones((F,), bool),
    )


def concat_factors(*fs: PoseGraphFactors) -> PoseGraphFactors:
    return PoseGraphFactors(*[jnp.concatenate(parts) for parts in zip(*fs)])
