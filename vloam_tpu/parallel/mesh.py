"""Device-mesh helpers for the distributed mapping / BA backend."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: join the jax.distributed coordination service so
    ``jax.devices()`` spans every host's chips and meshes built from it carry
    cross-host (DCN) collectives.

    On TPU pods the three arguments auto-detect from the environment; pass
    them explicitly for CPU loopback testing (tools/launch_multihost.py runs
    N local processes x 4 virtual devices this way).  Idempotent: safe to
    call when the backend is already initialized.
    """
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def map_mesh(n_devices: int | None = None, axis: str = "map") -> Mesh:
    """1-D mesh over the map-shard axis.

    Uses the GLOBAL device list: after ``init_distributed`` on a multi-host
    job this spans hosts, and the sharded mapping step's collectives ride
    ICI within a slice / DCN across hosts with no further changes."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if len(devs) < n:
        raise RuntimeError(
            f"map_mesh({n}) needs {n} devices but jax.devices() has "
            f"{len(devs)} ({devs[0].platform}); for a virtual CPU mesh set "
            "JAX_PLATFORMS=cpu and XLA_FLAGS=--xla_force_host_platform_"
            "device_count=N BEFORE importing jax (a site TPU plugin may pin "
            "the platform — jax.config.update('jax_platforms', 'cpu') after "
            "import overrides it; see tests/conftest.py)"
        )
    return Mesh(np.array(devs[:n]), (axis,))


def shard_map_state(state, mesh: Mesh, axis: str = "map"):
    """Place a MapState with cube-slot arrays AND the per-shard submap-cache
    arrays sharded along the mesh axis; poses/flags replicated.  Expects a
    state built with ``init_map_state(cfg, n_shards=S)`` (cache arrays sized
    S x per-shard capacity)."""
    from vloam_tpu.parallel.mapping_shard import MAP_SHARDED_FIELDS

    cube = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    leaves = []
    for name, leaf in zip(state._fields, state):
        leaves.append(jax.device_put(leaf, cube if name in MAP_SHARDED_FIELDS else rep))
    return type(state)(*leaves)
