"""Fused brute-force k-NN Pallas kernel — streaming lane-min over VMEM tiles.

The XLA formulation in ops/knn.py (distance matmul -> ``approx_min_k``)
materialises the (M, N) squared-distance matrix in HBM between the two ops:
for the mapping correspondence pass (8192 x 49152 f32) that is a ~3.2 GB
round trip per call — pure bandwidth, zero arithmetic intensity (measured
7.3 ms at correct f32 precision).  This kernel keeps every distance tile
in VMEM and reduces it on the fly:

  * d2 is computed in DIFFERENCE form, (qx-cx)^2 + ..., as pure VPU
    broadcasts of a (TM, 1) query column against (1, TN) candidate rows.
    This is exact f32 (no |q|^2 - 2 q.c cancellation) and measured ~2.5x
    faster than the MXU matmul form, whose f32 path costs a 6-pass bf16
    decomposition (Mosaic supports only DEFAULT/bf16 and HIGHEST dot
    precision, and bf16 distances are off by ~60 m^2 at metric scales).
  * Each candidate's identity is packed into the low 9 bits of its d2
    float's mantissa (idx // 128 fits 9 bits for N <= 65536); positive f32
    bit patterns order like the floats, so an int32 ``min`` keeps the
    nearest candidate AND its identity in one VPU pass.
  * Per query row, a running (128,)-lane minimum accumulates across
    candidate tiles in the revisited output block (one int32 key per lane
    class idx % 128); the lane index supplies the low 7 bits of the winner.
  * A tiny XLA epilogue top-k's the (M, 128) keys into (d2, idx) pairs.

Approximation contract (matches the ``approx_min_k`` path it replaces):
two true neighbours sharing a lane class (idx ≡ mod 128) return only the
nearer one.  Map/scan buffers are spatially sorted (sorted-scatter hints),
so true 5-NN are near-consecutive indices and land in distinct lanes;
random-data recall is ~98% for k=5, and every consumer
(fit_corner_lines / fit_surf_planes, laser_mapping.cpp:545-699 semantics)
gates on d2 anyway.  Packing clears 9 mantissa bits: d2 is reported with
relative error < 2^-14 (floor-rounded), immaterial against the 1 m gates.

Shapes are padded to (TM=256, TN=2048) tiles; masked candidates get
sentinel coordinates (1e6) whose d2 ~ 3e12 never wins a gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TM = 256          # queries per tile
TN = 2048         # candidates per tile
_LANES = 128
_GBITS = 9        # bits for the 128-group id -> N <= 512 * 128
_GMASK = (1 << _GBITS) - 1
SENTINEL = 1.0e6   # empty-candidate coordinate


def _knn_kernel(nt_ref, q_ref, ct_ref, out_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    active = (i < nt_ref[0]) & (j < nt_ref[1])

    # Revisited output block: seed every lane with NaN-bit keys at j == 0 so
    # query tiles past the valid count (whose compute is skipped entirely)
    # still decode to d2 = NaN, which every downstream gate rejects.
    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, jnp.iinfo(jnp.int32).max)

    @pl.when(active)
    def _():
        qx, qy, qz = q_ref[:, 0:1], q_ref[:, 1:2], q_ref[:, 2:3]     # (TM, 1)
        cx, cy, cz = ct_ref[0:1, :], ct_ref[1:2, :], ct_ref[2:3, :]  # (1, TN)
        dx, dy, dz = qx - cx, qy - cy, qz - cz
        d2 = dx * dx + dy * dy + dz * dz                    # (TM, TN), exact f32
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)  # >=0: int-ordered
        n_groups = TN // _LANES
        acc = None
        for r in range(n_groups):
            g = j * n_groups + r
            key = (bits[:, r * _LANES:(r + 1) * _LANES] & ~_GMASK) | g
            acc = key if acc is None else jnp.minimum(acc, key)
        out_ref[:] = jnp.minimum(out_ref[:], acc)


@jax.jit
def _lanemin_keys(q: jax.Array, ct: jax.Array, n_tiles: jax.Array) -> jax.Array:
    """n_tiles: (2,) int32 = (valid query tiles, valid candidate tiles).

    Tiles past the valid counts are skipped: their index maps clamp to the
    last valid tile (Pallas elides the repeated-block DMA) and ``pl.when``
    elides the compute, so kernel time scales with live occupancy rather
    than padded capacity — the gathered submap buffers are usually mostly
    padding (laser_mapping.h:113-122 sizes vs. post-voxel occupancy).
    """
    m_pad, n_pad = q.shape[0], ct.shape[1]
    grid = (m_pad // TM, n_pad // TN)
    return pl.pallas_call(
        _knn_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TM, 8), lambda i, j, nt: (jnp.minimum(i, nt[0] - 1), 0)),
                pl.BlockSpec((8, TN), lambda i, j, nt: (0, jnp.minimum(j, nt[1] - 1))),
            ],
            out_specs=pl.BlockSpec((TM, _LANES), lambda i, j, nt: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, _LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=9 * m_pad * n_pad,
            bytes_accessed=(m_pad + n_pad) * 32 + m_pad * _LANES * 4,
            transcendentals=0,
        ),
    )(n_tiles, q, ct)


def _pad_to(x: jax.Array, n: int, value: float) -> jax.Array:
    if x.shape[0] == n:
        return x
    return jnp.concatenate(
        [x, jnp.full((n - x.shape[0],) + x.shape[1:], value, x.dtype)]
    )


def knn_lanemin(
    query: jax.Array,       # (M, 3)
    cand: jax.Array,        # (N, 3)
    cand_mask: jax.Array,   # (N,) bool
    k: int,
    cand_count: jax.Array | None = None,   # () int32 valid-prefix length of cand
    query_count: jax.Array | None = None,  # () int32 valid-prefix length of query
) -> tuple[jax.Array, jax.Array]:
    """k nearest candidates per query: (sqdist (M, k), idx (M, k)).

    TPU-only (callers dispatch; ops/knn.py falls back to XLA elsewhere).
    Approximate per the lane-class contract in the module docstring.

    ``cand_count`` / ``query_count`` are optional *dynamic* valid-prefix
    lengths (buffers must be prefix-compacted, as the submap cache and
    feature stacks are): tiles wholly past a count are skipped inside the
    kernel, so time scales with occupancy, not capacity.  Queries past
    ``query_count`` return d2 = NaN (all gates reject).
    """
    m, n = query.shape[0], cand.shape[0]
    m_pad = -(-m // TM) * TM
    n_pad = -(-n // TN) * TN
    assert n_pad <= _LANES * (1 << _GBITS), "N exceeds 9-bit group id space"
    assert k <= _LANES

    def tiles(count, total_tiles, tile):
        if count is None:
            return jnp.int32(total_tiles)
        c = jnp.clip((count.astype(jnp.int32) + tile - 1) // tile, 1, total_tiles)
        return c.astype(jnp.int32)

    n_tiles = jnp.stack(
        [tiles(query_count, m_pad // TM, TM), tiles(cand_count, n_pad // TN, TN)]
    )

    # Rebase to the candidate bounding-box centre: keeps the squared terms
    # small at the km-scale world coordinates of long KITTI sequences (the
    # difference form is robust anyway; this bounds the residual f32
    # rounding of d2 itself at ~1e-3 m^2 for 1 m-gate neighbours).
    lo = jnp.min(jnp.where(cand_mask[:, None], cand, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(cand_mask[:, None], cand, -jnp.inf), axis=0)
    center = jnp.where(jnp.isfinite(lo), 0.5 * (lo + hi), 0.0)
    qc = (query - center).astype(jnp.float32)
    cc = jnp.where(cand_mask[:, None], (cand - center), SENTINEL)

    q8 = jnp.zeros((m_pad, 8), jnp.float32).at[:m, :3].set(qc)
    ct = jnp.full((8, n_pad), SENTINEL, jnp.float32).at[:3, :n].set(
        cc.astype(jnp.float32).T).at[3:, :].set(0.0)

    keys = _lanemin_keys(q8, ct, n_tiles)[:m]         # (M, 128) int32

    neg, lane = jax.lax.top_k(-keys, k)               # smallest keys
    kk = -neg
    d2 = jax.lax.bitcast_convert_type(kk & ~_GMASK, jnp.float32)
    idx = (kk & _GMASK) * _LANES + lane
    return d2, jnp.minimum(idx, n - 1).astype(jnp.int32)
