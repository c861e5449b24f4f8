"""Fused brute-force k-NN Pallas kernel — matmul + streaming lane-min merge.

The XLA formulation in ops/knn.py (distance matmul -> ``approx_min_k``)
materialises the (M, N) squared-distance matrix in HBM between the two ops:
for the mapping correspondence pass (8192 x 49152 f32) that is a ~3.2 GB
round trip per call, which measures ~3.8 ms on the target chip — pure
bandwidth, zero arithmetic intensity.  This kernel keeps every distance
tile in VMEM:

  * ONE MXU matmul per tile yields d2 directly: the query operand rows are
    (-2x, -2y, -2z, |q|^2, 1) and the candidate rows (x, y, z, 1, |c|^2),
    so the contraction sums to |q|^2 + |c|^2 - 2 q.c with f32 accumulation.
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
random-data recall is ~92%+ for k=5, and every consumer
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


def _knn_kernel(qt_ref, ct_ref, out_ref):
    j = pl.program_id(1)
    # d2 tile via a single MXU contraction (see module docstring).
    d2 = jax.lax.dot_general(
        qt_ref[:], ct_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Mosaic supports only DEFAULT (bf16, ~60 m^2 distance error — unusable
        # at metric coordinates) and HIGHEST (f32) dot precisions.
        precision=jax.lax.Precision.HIGHEST,
    )                                                   # (TM, TN)
    d2 = jnp.maximum(d2, 0.0)
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32)  # positive: int-ordered
    n_groups = TN // _LANES
    acc = None
    for r in range(n_groups):
        g = j * n_groups + r
        key = (bits[:, r * _LANES:(r + 1) * _LANES] & ~_GMASK) | g
        acc = key if acc is None else jnp.minimum(acc, key)

    @pl.when(j == 0)
    def _():
        out_ref[:] = acc

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.minimum(out_ref[:], acc)


@jax.jit
def _lanemin_keys(qt: jax.Array, ct: jax.Array) -> jax.Array:
    m_pad, n_pad = qt.shape[1], ct.shape[1]
    grid = (m_pad // TM, n_pad // TN)
    return pl.pallas_call(
        _knn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, TM), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, _LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, _LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * 8,
            bytes_accessed=(m_pad + n_pad) * 32 + m_pad * _LANES * 4,
            transcendentals=0,
        ),
    )(qt, ct)


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
) -> tuple[jax.Array, jax.Array]:
    """k nearest candidates per query: (sqdist (M, k), idx (M, k)).

    TPU-only (callers dispatch; ops/knn.py falls back to XLA elsewhere).
    Approximate per the lane-class contract in the module docstring.
    """
    m, n = query.shape[0], cand.shape[0]
    m_pad = -(-m // TM) * TM
    n_pad = -(-n // TN) * TN
    assert n_pad <= _LANES * (1 << _GBITS), "N exceeds 9-bit group id space"
    assert k <= _LANES

    # Rebase to the candidate bounding-box centre: the matmul form of d2
    # loses ~|q|^2 * eps_f32 to cancellation, which reaches ~1 m^2 at the
    # km-scale world coordinates of long KITTI sequences.  Candidates span
    # only the gathered submap window (~±130 m), so after centering the
    # error is bounded at ~4e-3 m^2 regardless of drive length.
    lo = jnp.min(jnp.where(cand_mask[:, None], cand, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(cand_mask[:, None], cand, -jnp.inf), axis=0)
    center = jnp.where(jnp.isfinite(lo), 0.5 * (lo + hi), 0.0)
    query = query - center
    cand = jnp.where(cand_mask[:, None], cand - center, SENTINEL)
    q = _pad_to(query.astype(jnp.float32), m_pad, 0.0)
    c = _pad_to(cand.astype(jnp.float32), n_pad, SENTINEL)

    zeros_q = jnp.zeros((3, m_pad), jnp.float32)
    qt = jnp.concatenate(
        [-2.0 * q.T,                                  # -2x, -2y, -2z
         jnp.sum(q * q, axis=1)[None, :],             # |q|^2
         jnp.ones((1, m_pad), jnp.float32),
         zeros_q], axis=0)                            # (8, M)
    zeros_c = jnp.zeros((3, n_pad), jnp.float32)
    ct = jnp.concatenate(
        [c.T,                                         # x, y, z
         jnp.ones((1, n_pad), jnp.float32),
         jnp.sum(c * c, axis=1)[None, :],             # |c|^2
         zeros_c], axis=0)                            # (8, N)

    keys = _lanemin_keys(qt, ct)[:m]                  # (M, 128) int32

    neg, lane = jax.lax.top_k(-keys, k)               # smallest keys
    kk = -neg
    d2 = jax.lax.bitcast_convert_type(kk & ~_GMASK, jnp.float32)
    idx = (kk & _GMASK) * _LANES + lane
    return d2, jnp.minimum(idx, n - 1).astype(jnp.int32)
