"""Fused Pallas GN solver (ops/pallas_gn.py) vs the XLA jacfwd path.

Runs the kernel in pallas interpret mode (CPU).  Same update rule, damping,
and Huber weights — poses must agree to f32 solver tolerance on realistic
registration problems.

Interpret mode does NOT exercise Mosaic-specific constraints (f32 scalar
prefetch in SMEM, dynamic pltpu.roll lane shifts, whole-array VMEM blocks);
the real lowering is validated on hardware by ``tools/smoke_tpu_kernels.py``
(run it on any Pallas/TPU toolchain bump).
"""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from vloam_tpu import geometry as geo
from vloam_tpu.ops import lidar_factors
from vloam_tpu.ops.gauss_newton import solve_pose_gn
from vloam_tpu.ops.pallas_gn import solve_pose_gn_lidar

ITERS, HUBER, LM = 4, 0.1, 1e-4


def _problem(rng, be=1024, bs=2048, noise=0.01):
    """Random rigid registration: points on lines/planes observed from a
    perturbed pose; the true pose is the known inverse perturbation."""
    aa = rng.normal(0, 0.02, 3)
    t_true = rng.normal(0, 0.3, 3)
    pose_true = geo.pose_from_qt(
        geo.angle_axis_to_quat(jnp.array(aa, jnp.float32)), jnp.array(t_true, jnp.float32)
    )

    # edge: pick line anchors a, direction u; p = inv(pose) applied to points on line
    a = rng.uniform(-20, 20, (be, 3)).astype(np.float32)
    u = rng.normal(0, 1, (be, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    s = rng.uniform(-0.5, 0.5, (be, 1)).astype(np.float32)
    pts_w = a + s * u + rng.normal(0, noise, (be, 3)).astype(np.float32)
    inv = geo.pose_inverse(pose_true)
    ep = np.asarray(geo.pose_apply(inv, jnp.array(pts_w)))
    ea, eb = a + 0.1 * u, a - 0.1 * u
    ev = rng.random(be) < 0.9

    n = rng.normal(0, 1, (bs, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.uniform(-5, 5, bs).astype(np.float32)
    q0 = rng.uniform(-20, 20, (bs, 3)).astype(np.float32)
    pw = q0 - (np.sum(n * q0, -1) + d)[:, None] * n  # project onto plane
    pw += rng.normal(0, noise, (bs, 3)).astype(np.float32)
    ppl = np.asarray(geo.pose_apply(inv, jnp.array(pw)))
    pv = rng.random(bs) < 0.9

    edge = (jnp.array(ep), jnp.array(ea), jnp.array(eb), jnp.array(ev))
    plane = (jnp.array(ppl), jnp.array(n), jnp.array(d), jnp.array(pv))
    return pose_true, edge, plane


def _xla_solve(pose0, edge, plane):
    ep, ea, eb, ev = edge
    pp, pn, pd, pv = plane

    def residuals(p):
        return (
            (lidar_factors.edge_residual(p, ep, ea, eb), ev),
            (lidar_factors.plane_residual(p, pp, pn, pd), pv),
        )

    return np.asarray(solve_pose_gn(residuals, pose0, ITERS, HUBER, LM))


def _pallas_solve(pose0, edge, plane):
    with pltpu.force_tpu_interpret_mode():
        out = solve_pose_gn_lidar(pose0, edge, plane, ITERS, HUBER, LM,
                                  _force_tpu_path=True)
    return np.asarray(out)


def test_matches_xla_path(rng):
    for trial in range(3):
        pose_true, edge, plane = _problem(rng)
        pose0 = geo.pose_identity()
        px = _xla_solve(pose0, edge, plane)
        pp = _pallas_solve(pose0, edge, plane)
        # same math, different op order: agreement to f32 solver tolerance
        np.testing.assert_allclose(pp[4:], px[4:], atol=2e-3)
        # quaternions up to sign
        qdot = abs(float(np.sum(pp[:4] * px[:4])))
        assert qdot > 1.0 - 1e-5, (pp, px)


def test_converges_to_truth(rng):
    pose_true, edge, plane = _problem(rng, noise=0.002)
    pp = _pallas_solve(geo.pose_identity(), edge, plane)
    np.testing.assert_allclose(pp[4:], np.asarray(pose_true)[4:], atol=0.02)
    qdot = abs(float(np.sum(pp[:4] * np.asarray(pose_true)[:4])))
    assert qdot > 1.0 - 1e-4


def test_all_invalid_keeps_pose(rng):
    """Zero valid correspondences: damped solve of a ~zero system must not
    produce NaNs and should leave the pose (nearly) unchanged."""
    _, edge, plane = _problem(rng)
    edge = edge[:3] + (jnp.zeros_like(edge[3]),)
    plane = plane[:3] + (jnp.zeros_like(plane[3]),)
    pose0 = geo.pose_from_qt(
        geo.angle_axis_to_quat(jnp.array([0.01, 0.02, -0.01])),
        jnp.array([1.0, -2.0, 0.5]),
    )
    out = _pallas_solve(pose0, edge, plane)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.asarray(pose0), atol=1e-3)


def test_unaligned_sizes_pad(rng):
    """Row counts not multiple of 1024 are zero-padded internally."""
    pose_true, edge, plane = _problem(rng, be=768, bs=1536)
    px = _xla_solve(geo.pose_identity(), edge, plane)
    pp = _pallas_solve(geo.pose_identity(), edge, plane)
    np.testing.assert_allclose(pp[4:], px[4:], atol=2e-3)


# ---------------------------------------------------------------------------
# VO solver kernel (solve_pose_gn_vo)
# ---------------------------------------------------------------------------

def _vo_problem(rng, m=512, depth_frac=0.6, noise=0.001):
    """Random two-view problem: 3D points observed by two cameras related by
    a known small motion; some matches carry depth (3D-2D), the rest are
    epipolar-only."""
    aa = rng.normal(0, 0.02, 3)
    t_true = np.array([0.1, -0.05, 0.8]) + rng.normal(0, 0.05, 3)
    pose_true = geo.pose_from_qt(
        geo.angle_axis_to_quat(jnp.array(aa, jnp.float32)), jnp.array(t_true, jnp.float32)
    )
    X0 = np.stack([
        rng.uniform(-10, 10, m), rng.uniform(-3, 3, m), rng.uniform(5, 40, m)
    ], -1).astype(np.float32)
    X1 = np.asarray(geo.pose_apply(pose_true, jnp.array(X0)))
    xb0 = X0[:, :2] / X0[:, 2:3] + rng.normal(0, noise, (m, 2))
    xb1 = X1[:, :2] / X1[:, 2:3] + rng.normal(0, noise, (m, 2))
    hd = rng.random(m) < depth_frac
    nd = ~hd
    return (pose_true, jnp.array(X0), jnp.array(xb0.astype(np.float32)),
            jnp.array(xb1.astype(np.float32)), jnp.array(hd), jnp.array(nd))


def test_vo_matches_xla_path(rng):
    from vloam_tpu.ops import vo_factors
    from vloam_tpu.ops.pallas_gn import solve_pose_gn_vo

    for _ in range(2):
        pose_true, X0, xb0, xb1, hd, nd = _vo_problem(rng)

        def residuals(p):
            return (
                (vo_factors.reproj_32_residual(p, X0, xb1), hd),
                (vo_factors.epipolar_22_residual(p, xb0, xb1), nd),
            )

        px = np.asarray(solve_pose_gn(residuals, geo.pose_identity(), ITERS, HUBER, LM))
        with pltpu.force_tpu_interpret_mode():
            pp = np.asarray(solve_pose_gn_vo(
                geo.pose_identity(), X0, xb0, xb1, hd, nd, ITERS, HUBER, LM,
                _force_tpu_path=True))
        np.testing.assert_allclose(pp[4:], px[4:], atol=5e-3)
        qdot = abs(float(np.sum(pp[:4] * px[:4])))
        assert qdot > 1.0 - 1e-5, (pp, px)


def test_vo_converges_to_truth(rng):
    from vloam_tpu.ops.pallas_gn import solve_pose_gn_vo

    pose_true, X0, xb0, xb1, hd, nd = _vo_problem(rng, noise=0.0002)
    with pltpu.force_tpu_interpret_mode():
        pp = np.asarray(solve_pose_gn_vo(
            geo.pose_identity(), X0, xb0, xb1, hd, nd, 10, HUBER, LM,
            _force_tpu_path=True))
    np.testing.assert_allclose(pp[4:], np.asarray(pose_true)[4:], atol=0.03)
    qdot = abs(float(np.sum(pp[:4] * np.asarray(pose_true)[:4])))
    assert qdot > 1.0 - 1e-4
