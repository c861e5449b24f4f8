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
