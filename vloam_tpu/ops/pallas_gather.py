"""Pallas patch-gather kernel — the hot gather primitive of the 2D frontend.

Every feature stage slices per-keypoint square patches out of full images
(KLT template/search windows, ORB/BRISK/FREAK descriptor supports:
image_util.cpp:503-570, :280-339).  XLA lowers a vmapped dynamic_slice to a
row-granular gather; this kernel instead issues one async DMA per keypoint
from HBM into VMEM and compacts in-register — faster end-to-end, and the
copies overlap with the per-patch compaction.

TPU DMA legality (Mosaic) requires HBM slice offsets aligned to the tile
grid: rows mod 8, lanes mod 128 (and lane widths mod 128).  Two in-register
tricks make arbitrary integer corners legal with ZERO image preprocessing:

  * lanes: the DMA grabs a 256-lane band from a 128-aligned base and the
    kernel rotates lanes in-register (``pltpu.roll`` on the lane axis,
    dynamic shifts supported) before keeping the first P columns;
  * rows: the DMA grabs P+8 rows from an 8-aligned base and the kernel
    selects among the 8 STATIC sublane offsets (dynamic sublane rotates are
    not supported by Mosaic, but static slices + a scalar-predicated select
    chain are) — this replaces an earlier scheme that pre-rolled every image
    into 8 shifted HBM copies, which cost ~1.5 ms/frame of pure HBM
    bandwidth on KITTI-sized frames before any patch was gathered.

Kernel I/O per keypoint: one (P+8, 256) f32 DMA + one lane roll + an 8-way
select + one (P, P) store.  Keypoints are processed in blocks of B per grid
step; all B DMAs are in flight before the first compaction waits.  Multiple
source images ride in ONE kernel launch as a stacked (n_img, H_pad, W_pad)
ref with a per-keypoint image id — one ref/one scalar-arg keeps the kernel
inside the SMEM budget (a two-ref variant overflows v5e scalar memory).

The CPU fallback (and the reference semantics oracle) is the vmapped
dynamic_slice in ops/image_ops._slice_patches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

P_DEFAULT = 32
_LW = 256        # lane-aligned DMA band width
_B = 32          # keypoints per grid step


def pad_img(img: jax.Array) -> jax.Array:
    """(H, W) -> (H_pad, W_pad): rows padded so an 8-aligned (P+8)-row band
    below any legal corner stays in bounds, lanes so any 128-aligned 256-lane
    band does.  Pad content never reaches an extracted window."""
    H, W = img.shape
    H_pad = ((H - 1) // 8 + 2) * 8
    W_pad = ((W - 1) // 128 + 2) * 128
    return jnp.pad(img, ((0, H_pad - H), (0, W_pad - W)))


@functools.partial(jax.jit, static_argnames=("P",))
def _gather_stacked_tpu(imgs, meta, P: int):
    """imgs: (n_img, H_pad, W_pad); meta: (3, N) int32 rows (img_id; cx; cy)
    — transposed so SMEM's last-dim padding (to 128 lanes) stays tiny.
    Returns (N, P, P) patches."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = meta.shape[1]
    P8 = P + 8

    def kernel(meta_ref, img_ref, out_ref, scratch, sem):
        i = pl.program_id(0)

        def addr(k):
            b = meta_ref[0, i * _B + k]
            cx = meta_ref[1, i * _B + k]
            cy = meta_ref[2, i * _B + k]
            dy = jax.lax.rem(cy, 8)
            cy8 = pl.multiple_of(cy - dy, 8)
            cx128 = pl.multiple_of((cx // 128) * 128, 128)
            return b, dy, cx - cx128, cy8, cx128

        for k in range(_B):
            b, dy, dx, cy8, cx128 = addr(k)
            pltpu.make_async_copy(
                img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)],
                scratch.at[k], sem.at[k],
            ).start()
        for k in range(_B):
            b, dy, dx, cy8, cx128 = addr(k)
            pltpu.make_async_copy(
                img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)],
                scratch.at[k], sem.at[k],
            ).wait()
            rolled = pltpu.roll(scratch[k], -dx, 1)[:, :P]   # (P8, P)
            sel = rolled[7:7 + P, :]
            for r in range(6, -1, -1):
                sel = jnp.where(dy == r, rolled[r:r + P, :], sel)
            out_ref[k] = sel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // _B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_B, P8, _LW), jnp.float32),
            pltpu.SemaphoreType.DMA((_B,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, P, P), jnp.float32),
        grid_spec=grid_spec,
    )(meta, imgs)


def gather_patches(
    img: jax.Array,        # (H, W) f32
    corners: jax.Array,    # (N, 2) int32 xy, pre-clipped to [0, W-P] x [0, H-P]
    P: int = P_DEFAULT,
) -> jax.Array:
    """Single-image variant of gather_patches_pair: (N, P, P) patches."""
    N = corners.shape[0]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not on_tpu or N % _B != 0 or img.shape[1] < _LW:
        from vloam_tpu.ops.image_ops import _slice_patches

        return _slice_patches(img, corners, P)
    meta = jnp.stack(
        [jnp.zeros((N,), jnp.int32), corners[:, 0], corners[:, 1]]
    )
    return _gather_stacked_tpu(pad_img(img)[None], meta, P)


def gather_patches_stack(
    imgs: jax.Array,       # (C, H, W) f32 — e.g. a blur stack of one octave
    corners: jax.Array,    # (N, 2) int32 xy, pre-clipped
    P: int = P_DEFAULT,
) -> jax.Array:
    """Slice every image's patch at every corner: (C, N, P, P), one kernel."""
    C, H, W = imgs.shape
    N = corners.shape[0]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not on_tpu or (C * N) % _B != 0 or W < _LW:
        from vloam_tpu.ops.image_ops import _slice_patches_multi

        return _slice_patches_multi(imgs, corners, P).transpose(1, 0, 2, 3)
    ids = jnp.repeat(jnp.arange(C, dtype=jnp.int32), N)
    cxy = jnp.tile(corners, (C, 1))
    meta = jnp.stack([ids, cxy[:, 0], cxy[:, 1]])
    out = _gather_stacked_tpu(jax.vmap(pad_img)(imgs), meta, P)   # (C*N, P, P)
    return out.reshape(C, N, P, P)


def gather_patches_pair(
    img_a: jax.Array,      # (H, W) f32
    img_b: jax.Array,
    corners_a: jax.Array,  # (N, 2) int32 xy, pre-clipped to [0, W-P] x [0, H-P]
    corners_b: jax.Array,
    P: int = P_DEFAULT,
) -> tuple[jax.Array, jax.Array]:
    """Slice (N, P, P) patches from two images at per-keypoint corners.

    TPU: one pallas DMA kernel (both images in one launch).  Other backends
    (CPU tests): the vmapped dynamic_slice oracle.  2N must be a multiple of
    the block size on TPU; callers use power-of-two feature buffers.
    """
    N = corners_a.shape[0]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not on_tpu or (2 * N) % _B != 0 or img_a.shape[1] < _LW:
        from vloam_tpu.ops.image_ops import _slice_patches

        return _slice_patches(img_a, corners_a, P), _slice_patches(img_b, corners_b, P)

    imgs = jnp.stack([pad_img(img_a), pad_img(img_b)])
    ids = jnp.concatenate([jnp.zeros((N,), jnp.int32), jnp.ones((N,), jnp.int32)])
    cxy = jnp.concatenate([corners_a, corners_b])          # (2N, 2)
    meta = jnp.stack([ids, cxy[:, 0], cxy[:, 1]])          # (3, 2N)
    out = _gather_stacked_tpu(imgs, meta, P)
    return out[:N], out[N:]
