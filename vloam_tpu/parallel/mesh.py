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


_CUBE_FIELDS = ("cube_pts", "corner_cnt", "surf_cnt", "cube_coord")


def shard_map_state(state, mesh: Mesh, axis: str = "map"):
    """Place a MapState with cube-slot arrays sharded along the slot axis and
    everything else (poses, flags, the single-device submap cache) replicated."""
    cube = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    leaves = []
    for name, leaf in zip(state._fields, state):
        leaves.append(jax.device_put(leaf, cube if name in _CUBE_FIELDS else rep))
    return type(state)(*leaves)
