"""Device-mesh helpers for the distributed mapping / BA backend."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def map_mesh(n_devices: int | None = None, axis: str = "map") -> Mesh:
    """1-D mesh over the map-shard axis."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), (axis,))


def shard_map_state(state, mesh: Mesh, axis: str = "map"):
    """Place a MapState with cube arrays sharded along the slot axis and the
    small pose/flag leaves replicated."""
    cube = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(path_leaf):
        name, leaf = path_leaf
        return jax.device_put(leaf, cube if leaf.ndim >= 1 and leaf.shape[0] % mesh.size == 0 and leaf.shape[0] > 16 else rep)

    leaves = []
    for name, leaf in zip(state._fields, state):
        big = hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] > 16
        leaves.append(jax.device_put(leaf, cube if big else rep))
    return type(state)(*leaves)
