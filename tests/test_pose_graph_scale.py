"""Pose graph at drift scale: a 600-node biased circle closes and ATE
improves — evidence that the loop_drive result (endpoint closed 230x, ATE
~flat) is the single-revisit information limit, not an optimizer failure.

On a pure yaw-bias spiral with exact loop factors, GN recovers ~1/3 of the
ATE and drives the endpoint error to ~zero; the remaining interior error is
the unobservable shape deformation (one revisit region constrains the gap,
not the curvature profile along the lap)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vloam_tpu import geometry as geo
from vloam_tpu.parallel.loop_closure import loop_factors
from vloam_tpu.parallel.pose_graph import (
    concat_factors, odometry_factors, optimize_pose_graph,
)


def _circle_chain(n, speed, rate):
    poses = []
    yaw, t = 0.0, np.zeros(3)
    for _ in range(n):
        q = geo.angle_axis_to_quat(jnp.array([0, 0, yaw], jnp.float32))
        poses.append(np.concatenate([np.asarray(q), t]).astype(np.float32))
        t = t + np.array([speed * np.cos(yaw), speed * np.sin(yaw), 0.0])
        yaw += rate
    return np.stack(poses)


@pytest.mark.slow
def test_pose_graph_closes_biased_circle_at_scale():
    n, speed = 600, 1.3
    w = 2 * np.pi / n
    gt = _circle_chain(n, speed, w)
    est = _circle_chain(n, speed, w * (1 - 0.04))   # 4% yaw bias: open spiral

    pj = jnp.array(est)
    deltas = jax.vmap(geo.pose_compose)(
        jax.vmap(geo.pose_inverse)(pj[:-1]), pj[1:]
    )
    pairs = [(0, n - 30), (0, n - 10)]
    zs = [
        np.asarray(geo.pose_compose(
            geo.pose_inverse(jnp.array(gt[j])), jnp.array(gt[k])
        ))
        for j, k in pairs
    ]
    fac = concat_factors(
        odometry_factors(deltas, weight=1.0), loop_factors(pairs, zs, weight=5.0)
    )
    refined = np.asarray(optimize_pose_graph(jnp.array(est), fac, iters=8))

    gtp = gt[:, 4:]
    raw_fin = np.linalg.norm(est[-1, 4:] - gtp[-1])
    fin = np.linalg.norm(refined[-1, 4:] - gtp[-1])
    raw_ate = np.mean(np.linalg.norm(est[:, 4:] - gtp, axis=1))
    ate = np.mean(np.linalg.norm(refined[:, 4:] - gtp, axis=1))
    print(f"\nfinal {raw_fin:.2f} -> {fin:.3f} m; ate {raw_ate:.2f} -> {ate:.2f} m")
    assert raw_fin > 10.0                       # the bias visibly opens the lap
    assert fin < 0.05 * raw_fin                 # the loop CLOSES
    assert ate < 0.8 * raw_ate                  # interior improves (bounded by
                                                # the single-revisit info limit)