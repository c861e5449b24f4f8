"""Fused Gauss-Newton solver kernel for the lidar registration problems.

The XLA formulation (ops/gauss_newton.solve_pose_gn with jacfwd Jacobians)
is mathematically right but launch-bound: one unrolled GN iteration is ~30
small device ops (tangent-batched residual evaluation, Huber weights, two
thin matmuls, an unrolled 6x6 Cholesky, the quaternion update), each a few
µs of fixed overhead against µs of real work.  The LO and MO solves run
2 outer x 4 inner iterations per frame (laser_odometry.cpp:224,503;
laser_mapping.cpp:526,712), so the pipeline pays that overhead ~16x/frame.

This kernel runs ALL inner iterations of one solve in a single Pallas
launch.  Per iteration, entirely in VMEM/registers:

  * analytic residuals + Jacobians for the two reference factor types
    (point-to-line, lidarFactor.hpp:41-46; point-to-plane via unit normal,
    lidarFactor.hpp:130) under the local-tangent parameterisation
    q <- exp(dtheta) (x) q, t <- t + dt (gauss_newton.pose_plus);
  * Ceres-style Huber block weights (rho'(s) = min(1, delta/|r|));
  * J^T J / J^T r as 27 + 27 lane reductions of component-row products;
  * the damped 6x6 Cholesky solve and the quaternion update as unrolled
    scalar arithmetic on the scalar core.

Data layout: each per-point component (p_x, p_y, ..., valid) is reshaped
(B,) -> (8, B/8) so every VPU op runs on full (8, 128) tiles; components
stack into one (n_comp*8, B/8) input per factor type.

Numerics match solve_pose_gn to f32 rounding (same update rule, same
damping, same Huber weights); the analytic Jacobians replace jacfwd.
CPU/GPU and the distributed (psum) path keep using solve_pose_gn.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cross(u, v):
    return (
        u[1] * v[2] - u[2] * v[1],
        u[2] * v[0] - u[0] * v[2],
        u[0] * v[1] - u[1] * v[0],
    )


def _dot3(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


def _chol_solve6(A, b):
    """Unrolled 6x6 Cholesky solve on scalars (mirrors linalg3.solve_spd_small)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _quat_update(q, dtheta):
    """q <- normalize(exp(dtheta) (x) q), scalars, mirroring
    geometry.angle_axis_to_quat + quat_mul (xyzw Hamilton)."""
    tx, ty, tz = dtheta
    theta = jnp.sqrt(tx * tx + ty * ty + tz * tz)
    small = theta < 1e-8
    k = jnp.where(small, 0.5, jnp.sin(0.5 * theta) / jnp.maximum(theta, 1e-12))
    dx, dy, dz = tx * k, ty * k, tz * k
    dw = jnp.where(small, 1.0, jnp.cos(0.5 * theta))
    qx, qy, qz, qw = q
    nx = dw * qx + dx * qw + dy * qz - dz * qy
    ny = dw * qy - dx * qz + dy * qw + dz * qx
    nz = dw * qz + dx * qy - dy * qx + dz * qw
    nw = dw * qw - dx * qx - dy * qy - dz * qz
    inv = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz + nw * nw)
    return (nx * inv, ny * inv, nz * inv, nw * inv)


def _rot_rows(q):
    """3x3 rotation entries from unit quaternion scalars (xyzw)."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def _accumulate(cols, r_rows, sw):
    """Weighted J^T J (upper 21) and J^T r (6) lane-sums.

    cols: 6 Jacobian columns, each a tuple of rdim (8, Bb) component rows;
    r_rows: rdim residual rows; sw: sqrt(weight) row."""
    wc = [tuple(sw * c for c in col) for col in cols]
    wr = tuple(sw * r for r in r_rows)

    def rdot(u, v):
        s = u[0] * v[0]
        for d in range(1, len(u)):
            s = s + u[d] * v[d]
        return jnp.sum(s)

    jtj = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i, 6):
            jtj[i][j] = rdot(wc[i], wc[j])
            jtj[j][i] = jtj[i][j]
    jtr = [rdot(wc[i], wr) for i in range(6)]
    return jtj, jtr


def _gn_kernel(iters: int, huber_delta: float, lm_lambda: float,
               pose_ref, ed_ref, pl_ref, out_ref):
    """One launch = the full inner GN loop for one lidar solve."""
    q = (pose_ref[0], pose_ref[1], pose_ref[2], pose_ref[3])
    t = (pose_ref[4], pose_ref[5], pose_ref[6])

    def row(ref, i):
        return ref[8 * i:8 * (i + 1), :]

    ep = tuple(row(ed_ref, i) for i in range(3))        # point
    ech = tuple(row(ed_ref, 3 + i) for i in range(3))   # unit line direction
    ek = tuple(row(ed_ref, 6 + i) for i in range(3))    # (a x b)/|a-b|
    ev = row(ed_ref, 9)                                 # validity in {0,1}
    pp = tuple(row(pl_ref, i) for i in range(3))
    pn = tuple(row(pl_ref, 3 + i) for i in range(3))
    pd = row(pl_ref, 6)
    pv = row(pl_ref, 7)

    delta2 = jnp.float32(huber_delta * huber_delta)

    for _ in range(iters):
        R = _rot_rows(q)

        # ---- edge factor: r = lp x ch + k --------------------------------
        rp = tuple(R[i][0] * ep[0] + R[i][1] * ep[1] + R[i][2] * ep[2]
                   for i in range(3))
        lp = tuple(rp[i] + t[i] for i in range(3))
        r = tuple(c + k for c, k in zip(_cross(lp, ech), ek))
        # J columns: rotation m -> ch x (rp x e_m); translation m -> e_m x ch
        cr = tuple(tuple(ech[i] * rp[j] for j in range(3)) for i in range(3))
        cols = [
            (-(cr[1][1] + cr[2][2]), cr[0][1], cr[0][2]),
            (cr[1][0], -(cr[0][0] + cr[2][2]), cr[1][2]),
            (cr[2][0], cr[2][1], -(cr[0][0] + cr[1][1])),
            (jnp.zeros_like(ev), -ech[2], ech[1]),
            (ech[2], jnp.zeros_like(ev), -ech[0]),
            (-ech[1], ech[0], jnp.zeros_like(ev)),
        ]
        sq = _dot3(r, r)
        w2 = ev * jnp.where(sq <= delta2, 1.0,
                            huber_delta * jax.lax.rsqrt(jnp.maximum(sq, 1e-20)))
        sw = jnp.sqrt(w2)
        jtj_e, jtr_e = _accumulate(cols, r, sw)

        # ---- plane factor: r = n . lp + d --------------------------------
        rp = tuple(R[i][0] * pp[0] + R[i][1] * pp[1] + R[i][2] * pp[2]
                   for i in range(3))
        lp = tuple(rp[i] + t[i] for i in range(3))
        r1 = _dot3(pn, lp) + pd
        # dr/dtheta_m = n . (-[rp]x e_m) = e_m . (rp x n)
        rxn = _cross(rp, pn)
        cols = [(rxn[0],), (rxn[1],), (rxn[2],), (pn[0],), (pn[1],), (pn[2],)]
        sq = r1 * r1
        w2 = pv * jnp.where(sq <= delta2, 1.0,
                            huber_delta * jax.lax.rsqrt(jnp.maximum(sq, 1e-20)))
        sw = jnp.sqrt(w2)
        jtj_p, jtr_p = _accumulate(cols, (r1,), sw)

        # ---- damped 6x6 solve + pose update (scalar core) ----------------
        A = [[jtj_e[i][j] + jtj_p[i][j] for j in range(6)] for i in range(6)]
        b = [-(jtr_e[i] + jtr_p[i]) for i in range(6)]
        for i in range(6):
            A[i][i] = A[i][i] + lm_lambda * A[i][i] + 1e-10
        dx = _chol_solve6(A, b)
        q = _quat_update(q, dx[:3])
        t = (t[0] + dx[3], t[1] + dx[4], t[2] + dx[5])

    out_ref[0, :] = jnp.stack([q[0], q[1], q[2], q[3], t[0], t[1], t[2], t[0] * 0])


def _vo_kernel(iters: int, huber_delta: float, lm_lambda: float,
               pose_ref, in_ref, out_ref):
    """Full inner GN loop of the VO solve (visual_odometry.cpp:304-482) in
    one launch: per match EITHER the 3D-2D reprojection residual
    (ceres_cost_function.h:58-100, when the previous pixel has lidar depth)
    OR the 2D-2D epipolar residual (:151-189) — complementary masks."""
    q = (pose_ref[0], pose_ref[1], pose_ref[2], pose_ref[3])
    t = (pose_ref[4], pose_ref[5], pose_ref[6])

    def row(i):
        return in_ref[8 * i:8 * (i + 1), :]

    X0 = (row(0), row(1), row(2))
    xb0 = (row(3), row(4))
    xb1 = (row(5), row(6))
    hd, nd = row(7), row(8)
    one = jnp.ones_like(hd)
    X0b = (xb0[0], xb0[1], one)
    X1b = (xb1[0], xb1[1], one)

    delta2 = jnp.float32(huber_delta * huber_delta)

    def hub(sq, valid):
        w2 = valid * jnp.where(sq <= delta2, 1.0,
                               huber_delta * jax.lax.rsqrt(jnp.maximum(sq, 1e-20)))
        return jnp.sqrt(w2)

    for _ in range(iters):
        R = _rot_rows(q)

        def rot(p):
            return tuple(R[i][0] * p[0] + R[i][1] * p[1] + R[i][2] * p[2]
                         for i in range(3))

        # ---- 3D-2D reprojection: r = [Yx - Yz xb1, Yy - Yz yb1] ----------
        u = rot(X0)
        Y = tuple(u[i] + t[i] for i in range(3))
        r = (Y[0] - Y[2] * xb1[0], Y[1] - Y[2] * xb1[1])
        # J_Y rotation col m = e_m x u; dr/dY rows (1,0,-xb), (0,1,-yb)
        cols = [
            (-u[1] * xb1[0], -u[2] - u[1] * xb1[1]),
            (u[2] + u[0] * xb1[0], u[0] * xb1[1]),
            (-u[1], u[0]),
            (one, jnp.zeros_like(one)),
            (jnp.zeros_like(one), one),
            (-xb1[0], -xb1[1]),
        ]
        sw = hub(r[0] * r[0] + r[1] * r[1], hd)
        jtj_a, jtr_a = _accumulate(cols, r, sw)

        # ---- 2D-2D epipolar: r = X1b . (t x (R X0b)) ---------------------
        v = rot(X0b)
        c = _cross(v, X1b)                       # = v x X1b; r = t . (v x X1b)
        r1 = t[0] * c[0] + t[1] * c[1] + t[2] * c[2]
        tv = t[0] * v[0] + t[1] * v[1] + t[2] * v[2]
        xv = _dot3(X1b, v)
        cols = [
            (X1b[0] * tv - t[0] * xv,),
            (X1b[1] * tv - t[1] * xv,),
            (X1b[2] * tv - t[2] * xv,),
            (c[0],), (c[1],), (c[2],),
        ]
        sw = hub(r1 * r1, nd)
        jtj_b, jtr_b = _accumulate(cols, (r1,), sw)

        A = [[jtj_a[i][j] + jtj_b[i][j] for j in range(6)] for i in range(6)]
        b = [-(jtr_a[i] + jtr_b[i]) for i in range(6)]
        for i in range(6):
            A[i][i] = A[i][i] + lm_lambda * A[i][i] + 1e-10
        dx = _chol_solve6(A, b)
        q = _quat_update(q, dx[:3])
        t = (t[0] + dx[3], t[1] + dx[4], t[2] + dx[5])

    out_ref[0, :] = jnp.stack([q[0], q[1], q[2], q[3], t[0], t[1], t[2], t[0] * 0])


@functools.partial(jax.jit, static_argnames=("iters", "huber_delta", "lm_lambda"))
def _vo_call(pose8, packed, iters, huber_delta, lm_lambda):
    kernel = functools.partial(_vo_kernel, iters, huber_delta, lm_lambda)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(packed.shape, lambda i, p: (0, 0))],
            out_specs=pl.BlockSpec((1, 8), lambda i, p: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
    )(pose8, packed)
    return out[0, :7]


def solve_pose_gn_vo(
    pose0: jax.Array,        # (7,)
    X0: jax.Array,           # (M, 3) unprojected previous-frame points
    xb0: jax.Array,          # (M, 2) previous normalised rays
    xb1: jax.Array,          # (M, 2) current normalised rays
    has_depth: jax.Array,    # (M,) -> 3D-2D residual
    no_depth: jax.Array,     # (M,) -> 2D-2D residual
    iters: int,
    huber_delta: float,
    lm_lambda: float,
    _force_tpu_path: bool = False,
) -> jax.Array:
    """Drop-in replacement for the XLA VO GN solve (10 jacfwd iterations of
    ~30 small ops each); falls back to solve_pose_gn off-TPU."""
    if jax.default_backend() in ("cpu", "gpu") and not _force_tpu_path:
        from vloam_tpu.ops import vo_factors
        from vloam_tpu.ops.gauss_newton import solve_pose_gn

        def residuals(p):
            return (
                (vo_factors.reproj_32_residual(p, X0, xb1), has_depth),
                (vo_factors.epipolar_22_residual(p, xb0, xb1), no_depth),
            )

        return solve_pose_gn(residuals, pose0, iters, huber_delta, lm_lambda)

    m = -(-X0.shape[0] // 1024) * 1024
    packed = _pack(
        [X0[:, 0], X0[:, 1], X0[:, 2], xb0[:, 0], xb0[:, 1], xb1[:, 0], xb1[:, 1],
         has_depth.astype(jnp.float32), no_depth.astype(jnp.float32)], m,
    )
    pose8 = jnp.concatenate([pose0.astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
    return _vo_call(pose8, packed, iters, float(huber_delta), float(lm_lambda))


def _pack(rows, b_pad):
    """Stack component rows (B,) -> one (len(rows)*8, b_pad//8) array."""
    out = []
    for r in rows:
        if r.shape[0] != b_pad:
            r = jnp.concatenate([r, jnp.zeros((b_pad - r.shape[0],), r.dtype)])
        out.append(r.reshape(8, b_pad // 8))
    return jnp.concatenate(out, axis=0)


@functools.partial(jax.jit, static_argnames=("iters", "huber_delta", "lm_lambda"))
def _gn_call(pose8, ed, pl_, iters, huber_delta, lm_lambda):
    kernel = functools.partial(_gn_kernel, iters, huber_delta, lm_lambda)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(ed.shape, lambda i, p: (0, 0)),
                pl.BlockSpec(pl_.shape, lambda i, p: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8), lambda i, p: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
    )(pose8, ed, pl_)
    return out[0, :7]


def solve_pose_gn_lidar(
    pose0: jax.Array,                  # (7,) [qx qy qz qw tx ty tz]
    edge: tuple,                       # (p (Be,3), a (Be,3), b (Be,3), valid (Be,))
    plane: tuple,                      # (p (Bs,3), n (Bs,3), d (Bs,), valid (Bs,))
    iters: int,
    huber_delta: float,
    lm_lambda: float,
    _force_tpu_path: bool = False,
) -> jax.Array:
    """Drop-in replacement for solve_pose_gn on the two lidar factor types.

    Precomputes the iteration-invariant edge constants ch = (a-b)/|a-b| and
    k = (a x b)/|a-b| (so r = lp x ch + k, identical to lidarFactor.hpp:44-46
    up to algebra), packs component rows, and runs the fused kernel.  On
    CPU/GPU it falls back to the XLA path for bitwise-comparable tests."""
    ep, ea, eb, ev = edge
    pp, pn, pd, pv = plane

    if jax.default_backend() in ("cpu", "gpu") and not _force_tpu_path:
        from vloam_tpu.ops import lidar_factors
        from vloam_tpu.ops.gauss_newton import solve_pose_gn

        def residuals(p):
            return (
                (lidar_factors.edge_residual(p, ep, ea, eb), ev),
                (lidar_factors.plane_residual(p, pp, pn, pd), pv),
            )

        return solve_pose_gn(residuals, pose0, iters, huber_delta, lm_lambda)

    c = ea - eb
    inv = 1.0 / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-10)
    ch = c * inv
    ek = jnp.cross(ea, eb) * inv

    be = -(-ep.shape[0] // 1024) * 1024
    bs = -(-pp.shape[0] // 1024) * 1024
    ed = _pack(
        [ep[:, 0], ep[:, 1], ep[:, 2], ch[:, 0], ch[:, 1], ch[:, 2],
         ek[:, 0], ek[:, 1], ek[:, 2], ev.astype(jnp.float32)], be,
    )
    pl_in = _pack(
        [pp[:, 0], pp[:, 1], pp[:, 2], pn[:, 0], pn[:, 1], pn[:, 2],
         pd, pv.astype(jnp.float32)], bs,
    )
    pose8 = jnp.concatenate([pose0.astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
    return _gn_call(pose8, ed, pl_in, iters, float(huber_delta), float(lm_lambda))
