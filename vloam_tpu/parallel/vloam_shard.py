"""The FULL coupled VLOAM step under a device mesh.

Parallel decomposition (SPMD over the "map" axis):
  * VO, scan registration, and LO are replicated — they are tiny (a few ms)
    and sequentially dependent, so sharding them buys nothing; every device
    computes identical copies (standard SPMD redundant compute).
  * The mapping stage — the hot, memory-bound part — runs the sharded twin
    (parallel/mapping_shard.sharded_mapping_step): cube-slot arrays are
    partitioned along the mesh axis, each shard NN-searches its own window
    slice, and one all_gather merges per-shard top-k.

This is the flagship multi-chip program: ``__graft_entry__.dryrun_multichip``
runs it (VO included) and tests/test_vloam_sharded.py pins its equivalence
with the single-device ``vloam_step``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vloam_tpu.config import VloamConfig
from vloam_tpu.models import frame_graph as fg
from vloam_tpu.models.vloam import VloamState, vloam_step
from vloam_tpu.parallel.mapping_shard import map_state_specs, sharded_mapping_step
from vloam_tpu.parallel.mesh import shard_map_state


def shard_vloam_state(state: VloamState, mesh: Mesh, axis: str = "map") -> VloamState:
    """Place a VloamState: cube-slot + cache arrays sharded, rest replicated.

    The mp subtree (by far the largest arrays in the program) is excluded
    from the replicated device_put so no device ever transiently holds a
    full copy of the cube map."""
    rep = NamedSharding(mesh, P())
    mp = shard_map_state(state.mp, mesh, axis)
    rest = jax.tree.map(lambda x: jax.device_put(x, rep), state._replace(mp=None))
    return rest._replace(mp=mp)


def state_partition_specs(state: VloamState, axis: str = "map"):
    """PartitionSpec pytree for a VloamState: cube-slot arrays on ``axis``,
    everything else replicated.  Used for jit out_shardings when
    materializing sharded state on a (possibly multi-host) mesh."""
    return _state_specs(state, axis)


def _state_specs(state: VloamState, axis: str):
    rep = P()
    specs = jax.tree.map(lambda _: rep, state)
    return specs._replace(mp=map_state_specs(axis))


def make_sharded_vloam_step(cfg: VloamConfig, ext: fg.Extrinsics, mesh: Mesh, axis: str = "map"):
    """jit-compiled shard_map wrapper of the FULL coupled step:
    (VloamState, img, cloud, cloud_mask) -> (VloamState, VloamOutputs)."""
    from vloam_tpu.models.vloam import init_vloam_state

    template = init_vloam_state(cfg)
    specs = _state_specs(template, axis)
    rep = P()

    def mapping_fn(st, ci, cm, si, sm, pw, cfg_):
        return sharded_mapping_step(st, ci, cm, si, sm, pw, cfg_, axis)

    def inner(state, img, cloud, cloud_mask):
        return vloam_step(
            state, img, cloud, cloud_mask, ext, cfg, mapping_fn=mapping_fn
        )

    @jax.jit
    def step(state, img, cloud, cloud_mask):
        f = jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(specs, rep, rep, rep),
            out_specs=(specs, rep),
            check_vma=False,
        )
        return f(state, img, cloud, cloud_mask)

    return step
