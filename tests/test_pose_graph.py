"""Pose-graph GN: loop closure pulls a drifting chain back; sharded factors match."""

import numpy as np
import jax
import jax.numpy as jnp

from vloam_tpu import geometry as geo
from vloam_tpu.parallel.pose_graph import (
    PoseGraphFactors,
    concat_factors,
    odometry_factors,
    optimize_pose_graph,
    optimize_pose_graph_banded,
)


def _make_square(n_side=5, step=1.0, drift=0.02, seed=0):
    """Ground truth: a closed square path.  Odometry deltas get a systematic
    drift; one loop-closure factor ties the last pose to the first."""
    rng = np.random.default_rng(seed)
    gt = [geo.pose_identity()]
    deltas_gt = []
    for leg in range(4):
        yaw = np.pi / 2
        for k in range(n_side):
            aa = jnp.array([0.0, 0.0, yaw if k == n_side - 1 else 0.0], jnp.float32)
            d = geo.pose_from_qt(geo.angle_axis_to_quat(aa), jnp.array([step, 0, 0], jnp.float32))
            deltas_gt.append(d)
            gt.append(geo.pose_compose(gt[-1], d))
    noisy = []
    for d in deltas_gt:
        nd = geo.pose_from_qt(
            geo.quat_normalize(d[:4] + jnp.array(rng.normal(scale=0.002, size=4), jnp.float32)),
            d[4:] + jnp.array([drift, 0, 0], jnp.float32),
        )
        noisy.append(nd)
    return jnp.stack(gt), jnp.stack(deltas_gt), jnp.stack(noisy)


def test_loop_closure_reduces_drift():
    gt, deltas_gt, noisy = _make_square()
    W = gt.shape[0]
    # integrate noisy odometry as the initial guess
    poses = [geo.pose_identity()]
    for d in noisy:
        poses.append(geo.pose_compose(poses[-1], d))
    poses = jnp.stack(poses)
    err_before = float(jnp.linalg.norm(poses[-1, 4:] - gt[-1, 4:]))

    odo = odometry_factors(noisy)
    loop = PoseGraphFactors(
        i=jnp.array([0], jnp.int32),
        j=jnp.array([W - 1], jnp.int32),
        z=geo.pose_compose(geo.pose_inverse(gt[0]), gt[W - 1])[None],
        weight=jnp.array([10.0], jnp.float32),
        valid=jnp.ones(1, bool),
    )
    factors = concat_factors(odo, loop)
    opt = optimize_pose_graph(poses, factors, iters=8)
    err_after = float(jnp.linalg.norm(opt[-1, 4:] - gt[-1, 4:]))
    assert err_after < 0.15 * err_before
    assert np.isfinite(np.asarray(opt)).all()


def test_banded_matches_dense():
    """Block-Thomas + Woodbury path == dense path on chain + loop graphs,
    with and without loop factors and with multiple odometry chains."""
    gt, deltas_gt, noisy = _make_square()
    W = gt.shape[0]
    poses = [geo.pose_identity()]
    for d in noisy:
        poses.append(geo.pose_compose(poses[-1], d))
    poses = jnp.stack(poses)

    chain = concat_factors(
        odometry_factors(noisy, weight=1.0), odometry_factors(deltas_gt, weight=0.2)
    )
    loop = PoseGraphFactors(
        i=jnp.array([0, 3], jnp.int32),
        j=jnp.array([W - 1, W - 5], jnp.int32),
        z=jnp.stack([
            geo.pose_compose(geo.pose_inverse(gt[0]), gt[W - 1]),
            geo.pose_compose(geo.pose_inverse(gt[3]), gt[W - 5]),
        ]),
        weight=jnp.array([10.0, 4.0], jnp.float32),
        valid=jnp.ones(2, bool),
    )
    dense = np.asarray(optimize_pose_graph(poses, concat_factors(chain, loop), iters=6))
    banded = np.asarray(optimize_pose_graph_banded(poses, chain, loop, iters=6))
    np.testing.assert_allclose(banded, dense, atol=5e-4)

    dense_nl = np.asarray(optimize_pose_graph(poses, chain, iters=4))
    banded_nl = np.asarray(optimize_pose_graph_banded(poses, chain, None, iters=4))
    np.testing.assert_allclose(banded_nl, dense_nl, atol=5e-4)

    # empty loop factor set degrades to the pure tridiagonal path
    from vloam_tpu.parallel.loop_closure import loop_factors as make_lf

    banded_empty = np.asarray(optimize_pose_graph_banded(poses, chain, make_lf([], []), iters=4))
    np.testing.assert_allclose(banded_empty, dense_nl, atol=5e-4)


def test_sharded_factors_match_single_device():
    gt, deltas_gt, noisy = _make_square()
    poses = [geo.pose_identity()]
    for d in noisy:
        poses.append(geo.pose_compose(poses[-1], d))
    poses = jnp.stack(poses)
    factors = odometry_factors(noisy)

    single = optimize_pose_graph(poses, factors, iters=4)

    # shard factors over 4 devices (pad to a multiple); invalid pads contribute 0
    n_dev = 4
    F = factors.i.shape[0]
    pad = -(-F // n_dev) * n_dev - F
    padded = PoseGraphFactors(
        i=jnp.pad(factors.i, (0, pad)),
        j=jnp.pad(factors.j, (0, pad)),
        z=jnp.pad(factors.z, ((0, pad), (0, 0))),
        weight=jnp.pad(factors.weight, (0, pad)),
        valid=jnp.pad(factors.valid, (0, pad)),
    )
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("f",))
    fspec = PoseGraphFactors(P("f"), P("f"), P("f"), P("f"), P("f"))
    sharded = jax.jit(
        jax.shard_map(
            lambda p, f: optimize_pose_graph(p, f, iters=4, axis_name="f"),
            mesh=mesh, in_specs=(P(), fspec), out_specs=P(), check_vma=False,
        )
    )(poses, padded)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=2e-4)
