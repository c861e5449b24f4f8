"""Pallas patch-gather kernel — the hot gather primitive of the 2D frontend.

Every feature stage slices per-keypoint square patches out of full images
(KLT template/search windows, ORB/BRISK/FREAK descriptor supports:
image_util.cpp:503-570, :280-339).  XLA lowers a vmapped dynamic_slice to a
row-granular gather; this kernel instead issues one async DMA per keypoint
from HBM into VMEM and compacts in-register — faster end-to-end, and the
copies overlap with the per-patch compaction.

TPU DMA legality (Mosaic) requires HBM slice offsets aligned to the tile
grid: rows mod 8, lanes mod 128 (and lane widths mod 128).  Two tricks make
arbitrary integer corners legal:
  * rows: the image is pre-rolled into 8 copies ``img8[r] = roll(img, -r)``
    (one cheap fused op, ~15 MB HBM for KITTI frames) so any row offset is
    reachable from an 8-aligned base in the right copy;
  * lanes: the DMA grabs a 256-lane band from a 128-aligned base and the
    kernel rotates lanes in-register (``pltpu.roll`` on the lane axis) before
    writing the exact (P, P) window.  Dynamic SUBLANE rotates are not
    supported by Mosaic — hence the img8 row trick instead of a row roll.

Kernel I/O per keypoint: one (P, 256) f32 DMA + one lane roll + one (P, P)
store.  Keypoints are processed in blocks of B per grid step; all B DMAs are
in flight before the first compaction waits.  Multiple source images ride in
ONE kernel launch as a stacked (n_img, 8, H, W) ref with a per-keypoint
image id — one ref/one scalar-arg keeps the kernel inside the SMEM budget
(a two-ref variant overflows v5e scalar memory).

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


def make_img8(img: jax.Array) -> jax.Array:
    """(H, W) -> (8, H, W_pad) row-rolled copies; copy r holds img shifted up
    r rows.  Lanes are zero-padded so every 128-aligned 256-lane DMA band
    below any legal corner stays in bounds (pad columns never reach the
    extracted window — the lane rotate discards them)."""
    W = img.shape[1]
    W_pad = ((W - 1) // 128 + 2) * 128
    img = jnp.pad(img, ((0, 0), (0, W_pad - W)))
    return jnp.stack([jnp.roll(img, -r, 0) for r in range(8)])


@functools.partial(jax.jit, static_argnames=("P",))
def _gather_stacked_tpu(imgs8, meta, P: int):
    """imgs8: (n_img, 8, H, W); meta: (3, N) int32 rows (img_id; cx; cy) —
    transposed so SMEM's last-dim padding (to 128 lanes) stays tiny.
    Returns (N, P, P) patches."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = meta.shape[1]

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
                img_ref.at[b, dy, pl.ds(cy8, P), pl.ds(cx128, _LW)],
                scratch.at[k], sem.at[k],
            ).start()
        for k in range(_B):
            b, dy, dx, cy8, cx128 = addr(k)
            pltpu.make_async_copy(
                img_ref.at[b, dy, pl.ds(cy8, P), pl.ds(cx128, _LW)],
                scratch.at[k], sem.at[k],
            ).wait()
            out_ref[k] = pltpu.roll(scratch[k], -dx, 1)[:, :P]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // _B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_B, P, _LW), jnp.float32),
            pltpu.SemaphoreType.DMA((_B,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, P, P), jnp.float32),
        grid_spec=grid_spec,
    )(meta, imgs8)


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
    imgs8 = make_img8(img)[None]
    meta = jnp.stack(
        [jnp.zeros((N,), jnp.int32), corners[:, 0], corners[:, 1]]
    )
    return _gather_stacked_tpu(imgs8, meta, P)


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
    imgs8 = jax.vmap(make_img8)(imgs)                      # (C, 8, H, W_pad)
    ids = jnp.repeat(jnp.arange(C, dtype=jnp.int32), N)
    cxy = jnp.tile(corners, (C, 1))
    meta = jnp.stack([ids, cxy[:, 0], cxy[:, 1]])
    out = _gather_stacked_tpu(imgs8, meta, P)              # (C*N, P, P)
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

    imgs8 = jnp.stack([make_img8(img_a), make_img8(img_b)])
    ids = jnp.concatenate([jnp.zeros((N,), jnp.int32), jnp.ones((N,), jnp.int32)])
    cxy = jnp.concatenate([corners_a, corners_b])          # (2N, 2)
    meta = jnp.stack([ids, cxy[:, 0], cxy[:, 1]])          # (3, 2N)
    out = _gather_stacked_tpu(imgs8, meta, P)
    return out[:N], out[N:]
