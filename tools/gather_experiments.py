"""Measure DMA formulations for the patch gather (VERDICT r4 #8).

The shipped gather_patches_pair issues one (P+8, 256) window DMA per
keypoint: 2048 DMAs x 40 strided row segments = ~82k DMA descriptors per
call, measured 0.814 ms (ROOFLINE_r04) — ~11% of the whole step.  The
hypothesis: the binding resource is ROW-SEGMENT DESCRIPTOR processing, not
issue count or bytes.  This experiment times, at the roofline shapes:

  A. the shipped per-keypoint window kernel (baseline);
  B. a full-width row-STRIP sweep: one contiguous (P+8, W_pad) DMA per
     8-aligned row base that any keypoint touches (<= 44 strips/image vs
     1024 window DMAs) — if descriptors bind, this is ~40x faster per byte;
  C. the XLA dynamic-slice fallback (sanity anchor).

If B wins as predicted, the production kernel becomes: sort keypoints by
row band outside the kernel, stream strips once each, compact per-keypoint
windows from VMEM (ops/pallas_gather strip path).

ROUND-5 RESULTS (v5e, all variants correct where checked):

  A  shipped per-kp window kernel   0.84-1.11 ms
  B  full-width strip sweep         0.59-0.61 ms (34 GB/s)
  B5 whole-image contiguous DMA     65 GB/s
  B6 conditional-narrow DMA         no change      -> bytes do not bind
  B7 DMA-only / B8 compaction-only  ~0.67 each     -> neither dominates
  B9 VMEM-resident image + roll     0.87-0.95 ms (needs pl.multiple_of
                                    hints on the dynamic slice offsets)
  B10 per-kp MXU one-hot extract    1.02 ms        -> small-matmul latency
  grouped DMAs (2/4/8/16 kp per     all flat ~0.92 -> DMA COUNT does not
  DMA over sorted corners)                            bind either

None of the hypothesized resources (descriptor processing, bytes, DMA
count, roll/select compute, output-tile padding) moved the number, because
the harness itself is the number: an EMPTY jitted op times ~0.8 ms through
the axon tunnel (per-dispatch overhead), and a lax.scan re-invoking a
kernel in-graph pays the same ~0.8 ms per iteration.  The in-step device
trace (tools/profile_trace.py) shows the shipped kernel at 0.301 ms inside
the production step — round 4's 0.814 ms roofline entry was dispatch, and
the "coalesce the DMAs" hypothesis this file was written to test is moot
at these shapes.  Kept as the record of how that was established.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=50):
    import jax

    r = fn()
    np.asarray(jax.tree.leaves(r)[0][:1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(jax.tree.leaves(r)[0][:1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main() -> None:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() in ("cpu", "gpu"):
        print("needs the TPU chip")
        sys.exit(1)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vloam_tpu.config import kitti_hdl64
    from vloam_tpu.ops.pallas_gather import gather_patches_pair, pad_img

    cfg = kitti_hdl64()
    H, W = cfg.visual.img_height, cfg.visual.img_width
    N, P = cfg.visual.max_features, 32
    rng = np.random.default_rng(0)
    img_a = jnp.array(rng.uniform(0, 255, (H, W)).astype(np.float32))
    img_b = jnp.array(rng.uniform(0, 255, (H, W)).astype(np.float32))
    corners = jnp.array(
        np.stack([rng.integers(0, W - P, N), rng.integers(0, H - P, N)], -1)
        .astype(np.int32)
    )

    # --- A: shipped kernel --------------------------------------------------
    gat = jax.jit(lambda a, b, c: gather_patches_pair(a, b, c, c, P))
    ms_a = timeit(lambda: gat(img_a, img_b, corners)) * 1e3
    print(f"A shipped per-keypoint window kernel : {ms_a:7.3f} ms")

    # --- B: full-width strip sweep -----------------------------------------
    # One contiguous (P8, W_pad) DMA per 8-aligned row base, both images,
    # every base (worst case: more strips than any real frame touches).
    pa = pad_img(img_a)
    pb = pad_img(img_b)
    H_pad, W_pad = pa.shape
    P8 = P + 8
    n_bases = (H_pad - P8) // 8 + 1

    @functools.partial(jax.jit, static_argnames=())
    def strip_sweep(imgs):
        def kernel(img_ref, out_ref, scratch, sem):
            i = pl.program_id(0)
            b = i // n_bases
            base = 8 * (i % n_bases)
            pltpu.make_async_copy(
                img_ref.at[b, pl.ds(base, P8), :], scratch, sem
            ).start()
            pltpu.make_async_copy(
                img_ref.at[b, pl.ds(base, P8), :], scratch, sem
            ).wait()
            # touch the strip so the copy cannot be elided: running max
            m = jnp.max(scratch[...], axis=0, keepdims=True)[:, :1]   # (1, 1)
            out_ref[:, :] = m + out_ref[:, :] * 0.0

        return pl.pallas_call(
            kernel,
            grid=(2 * n_bases,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((P8, W_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(imgs)

    imgs = jnp.stack([pa, pb])
    ms_b = timeit(lambda: strip_sweep(imgs)) * 1e3
    strips = 2 * n_bases
    mb = strips * P8 * W_pad * 4 / 1e6
    print(f"B full-width strip sweep ({strips} strips, {mb:.0f} MB): {ms_b:7.3f} ms "
          f"({mb / ms_b:.0f} GB/s)")

    # --- B2: double-buffered strip sweep (DMA i+1 in flight during wait i) --
    @functools.partial(jax.jit, static_argnames=())
    def strip_sweep_db(imgs):
        n_strips = 2 * n_bases

        def src(img_ref, i):
            b = i // n_bases
            base = 8 * (i % n_bases)
            return img_ref.at[b, pl.ds(base, P8), :]

        def kernel(img_ref, out_ref, scratch, sem):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                pltpu.make_async_copy(src(img_ref, 0), scratch.at[0], sem.at[0]).start()

            @pl.when(i + 1 < n_strips)
            def _():
                pltpu.make_async_copy(
                    src(img_ref, i + 1), scratch.at[(i + 1) % 2], sem.at[(i + 1) % 2]
                ).start()

            pltpu.make_async_copy(src(img_ref, i), scratch.at[i % 2], sem.at[i % 2]).wait()
            m = jnp.max(scratch[i % 2], axis=0, keepdims=True)[:, :1]
            out_ref[:, :] = m + out_ref[:, :] * 0.0

        return pl.pallas_call(
            kernel,
            grid=(n_strips,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, P8, W_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(imgs)

    ms_b2 = timeit(lambda: strip_sweep_db(imgs)) * 1e3
    print(f"B2 double-buffered strip sweep       : {ms_b2:7.3f} ms "
          f"({mb / ms_b2:.0f} GB/s)")

    # --- B3: batched strips — few grid steps, many DMAs in flight per step --
    BATCH = 11

    @functools.partial(jax.jit, static_argnames=())
    def strip_sweep_batched(imgs):
        n_strips = 2 * n_bases            # 88
        n_steps = n_strips // BATCH       # 8

        def src(img_ref, i):
            b = i // n_bases
            base = 8 * (i % n_bases)
            return img_ref.at[b, pl.ds(base, P8), :]

        def kernel(img_ref, out_ref, scratch, sem):
            s = pl.program_id(0)
            for k in range(BATCH):
                pltpu.make_async_copy(
                    src(img_ref, s * BATCH + k), scratch.at[k], sem.at[k]
                ).start()
            acc = jnp.zeros((1, 1), jnp.float32)
            for k in range(BATCH):
                pltpu.make_async_copy(
                    src(img_ref, s * BATCH + k), scratch.at[k], sem.at[k]
                ).wait()
                acc = acc + jnp.max(scratch[k], axis=0, keepdims=True)[:, :1]
            out_ref[:, :] = acc + out_ref[:, :] * 0.0

        return pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((BATCH, P8, W_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((BATCH,)),
            ],
        )(imgs)

    ms_b3 = timeit(lambda: strip_sweep_batched(imgs)) * 1e3
    print(f"B3 batched strips ({BATCH}/step)         : {ms_b3:7.3f} ms "
          f"({mb / ms_b3:.0f} GB/s)")

    # --- B4: 2D-flattened source (rows indexed, no leading image axis) ------
    @functools.partial(jax.jit, static_argnames=())
    def strip_sweep_flat(img2d):
        n_strips = 2 * n_bases

        def src(img_ref, i):
            b = i // n_bases
            base = 8 * (i % n_bases)
            return img_ref.at[pl.ds(b * H_pad + base, P8), :]

        def kernel(img_ref, out_ref, scratch, sem):
            s = pl.program_id(0)
            for k in range(BATCH):
                pltpu.make_async_copy(
                    src(img_ref, s * BATCH + k), scratch.at[k], sem.at[k]
                ).start()
            acc = jnp.zeros((1, 1), jnp.float32)
            for k in range(BATCH):
                pltpu.make_async_copy(
                    src(img_ref, s * BATCH + k), scratch.at[k], sem.at[k]
                ).wait()
                acc = acc + jnp.max(scratch[k], axis=0, keepdims=True)[:, :1]
            out_ref[:, :] = acc + out_ref[:, :] * 0.0

        return pl.pallas_call(
            kernel,
            grid=(n_strips // BATCH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((BATCH, P8, W_pad), jnp.float32),
                pltpu.SemaphoreType.DMA((BATCH,)),
            ],
        )(img2d)

    img2d = imgs.reshape(2 * H_pad, W_pad)
    ms_b4 = timeit(lambda: strip_sweep_flat(img2d)) * 1e3
    print(f"B4 flat-2D batched strips            : {ms_b4:7.3f} ms "
          f"({mb / ms_b4:.0f} GB/s)")

    # --- B5: one whole-image DMA per step (max copy size, 10 reps) ----------
    @functools.partial(jax.jit, static_argnames=())
    def whole_image(img2d):
        rows = img2d.shape[0]

        def kernel(img_ref, out_ref, scratch, sem):
            pltpu.make_async_copy(img_ref, scratch, sem).start()
            pltpu.make_async_copy(img_ref, scratch, sem).wait()
            m = jnp.max(scratch[...], axis=0, keepdims=True)[:, :1]
            out_ref[:, :] = m + out_ref[:, :] * 0.0

        return pl.pallas_call(
            kernel,
            grid=(10,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2 * H_pad, W_pad), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(img2d)

    ms_b5 = timeit(lambda: whole_image(img2d)) * 1e3
    mb5 = 10 * 2 * H_pad * W_pad * 4 / 1e6
    print(f"B5 whole-image DMA x10 ({mb5:.0f} MB)      : {ms_b5:7.3f} ms "
          f"({mb5 / ms_b5:.0f} GB/s)")

    # --- B6: shipped kernel + conditional narrow (128-lane) DMA -------------
    # Keypoints with in-band offset dx <= 128 - P (75% for random corners)
    # need only a 128-lane band: bytes drop ~40% at unchanged concurrency.
    _LW = 256
    _B = 32
    P8 = P + 8

    @functools.partial(jax.jit, static_argnames=())
    def gather_narrow(imgs_st, meta):
        N2 = meta.shape[1]

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
                narrow = dx <= 128 - P

                @pl.when(narrow)
                def _():
                    pltpu.make_async_copy(
                        img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, 128)],
                        scratch.at[k, :, pl.ds(0, 128)], sem.at[k],
                    ).start()

                @pl.when(jnp.logical_not(narrow))
                def _():
                    pltpu.make_async_copy(
                        img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)],
                        scratch.at[k], sem.at[k],
                    ).start()

            for k in range(_B):
                b, dy, dx, cy8, cx128 = addr(k)
                narrow = dx <= 128 - P

                @pl.when(narrow)
                def _():
                    pltpu.make_async_copy(
                        img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, 128)],
                        scratch.at[k, :, pl.ds(0, 128)], sem.at[k],
                    ).wait()

                @pl.when(jnp.logical_not(narrow))
                def _():
                    pltpu.make_async_copy(
                        img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)],
                        scratch.at[k], sem.at[k],
                    ).wait()
                rolled = pltpu.roll(scratch[k], -dx, 1)[:, :P]
                sel = rolled[7:7 + P, :]
                for r in range(6, -1, -1):
                    sel = jnp.where(dy == r, rolled[r:r + P, :], sel)
                out_ref[k] = sel

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N2 // _B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_B, P8, _LW), jnp.float32),
                pltpu.SemaphoreType.DMA((_B,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N2, P, P), jnp.float32),
            grid_spec=grid_spec,
        )(meta, imgs_st)

    ids = jnp.concatenate([jnp.zeros((N,), jnp.int32), jnp.ones((N,), jnp.int32)])
    cxy = jnp.concatenate([corners, corners])
    meta = jnp.stack([ids, cxy[:, 0], cxy[:, 1]])
    out_n = gather_narrow(imgs, meta)
    ref_a, ref_b = gat(img_a, img_b, corners)
    ok = np.allclose(np.asarray(out_n[:N]), np.asarray(ref_a)) and \
        np.allclose(np.asarray(out_n[N:]), np.asarray(ref_b))
    ms_b6 = timeit(lambda: gather_narrow(imgs, meta)) * 1e3
    print(f"B6 conditional-narrow window kernel  : {ms_b6:7.3f} ms  correct={ok}")

    # --- B7: attribution — DMA-only vs compaction-only ----------------------
    @functools.partial(jax.jit, static_argnames=())
    def dma_only(imgs_st, meta):
        N2 = meta.shape[1]

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
                out_ref[k] = scratch[k][:P, :P]        # raw corner, no roll/select

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N2 // _B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_B, P8, _LW), jnp.float32),
                pltpu.SemaphoreType.DMA((_B,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N2, P, P), jnp.float32),
            grid_spec=grid_spec,
        )(meta, imgs_st)

    ms_b7 = timeit(lambda: dma_only(imgs, meta)) * 1e3
    print(f"B7 DMA-only (no roll/select)         : {ms_b7:7.3f} ms")

    @functools.partial(jax.jit, static_argnames=())
    def compact_only(imgs_st, meta):
        N2 = meta.shape[1]

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

            # ONE dma for the whole block, then full compaction per keypoint
            b, dy, dx, cy8, cx128 = addr(0)
            pltpu.make_async_copy(
                img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)],
                scratch.at[0], sem.at[0],
            ).start()
            pltpu.make_async_copy(
                img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)],
                scratch.at[0], sem.at[0],
            ).wait()
            for k in range(_B):
                b, dy, dx, cy8, cx128 = addr(k)
                rolled = pltpu.roll(scratch[0], -dx, 1)[:, :P]
                sel = rolled[7:7 + P, :]
                for r in range(6, -1, -1):
                    sel = jnp.where(dy == r, rolled[r:r + P, :], sel)
                out_ref[k] = sel

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N2 // _B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, P8, _LW), jnp.float32),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N2, P, P), jnp.float32),
            grid_spec=grid_spec,
        )(meta, imgs_st)

    ms_b8 = timeit(lambda: compact_only(imgs, meta)) * 1e3
    print(f"B8 compaction-only (1 DMA/block)     : {ms_b8:7.3f} ms")

    # --- B9: whole images resident in VMEM, per-keypoint VMEM slice ---------
    # Transport collapses to 2 contiguous image DMAs (~66us, B5); compaction
    # reads its (P8, 256) band straight from the VMEM-resident image at
    # 8/128-aligned dynamic offsets.
    @functools.partial(jax.jit, static_argnames=())
    def gather_vmem_resident(imgs_st, meta):
        N2 = meta.shape[1]

        def kernel(meta_ref, img_ref, out_ref):
            i = pl.program_id(0)
            for k in range(_B):
                b = meta_ref[0, i * _B + k]
                cx = meta_ref[1, i * _B + k]
                cy = meta_ref[2, i * _B + k]
                dy = jax.lax.rem(cy, 8)
                cy8 = cy - dy
                dx = jax.lax.rem(cx, 128)
                cx128 = cx - dx
                band = img_ref[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)]
                rolled = pltpu.roll(band, -dx, 1)[:, :P]
                sel = rolled[7:7 + P, :]
                for r in range(6, -1, -1):
                    sel = jnp.where(dy == r, rolled[r:r + P, :], sel)
                out_ref[k] = sel

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N2 // _B,),
            in_specs=[pl.BlockSpec(
                (2, H_pad, W_pad), lambda i, m: (0, 0, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N2, P, P), jnp.float32),
            grid_spec=grid_spec,
        )(meta, imgs_st)

    try:
        out9 = gather_vmem_resident(imgs, meta)
        ok9 = np.allclose(np.asarray(out9[:N]), np.asarray(ref_a)) and \
            np.allclose(np.asarray(out9[N:]), np.asarray(ref_b))
        ms_b9 = timeit(lambda: gather_vmem_resident(imgs, meta)) * 1e3
        print(f"B9 VMEM-resident image, roll/select  : {ms_b9:7.3f} ms  correct={ok9}")
    except Exception as e:
        print(f"B9 VMEM-resident image               : FAILED ({type(e).__name__}: {e})"[:200])

    # --- B10: per-keypoint DMA + MXU one-hot lane extraction ----------------
    # The 256-lane roll is VPU-bound (~B8); replace it with
    # (P8, 256) @ one-hot(dx) (256, P) on the MXU, then the 8-way row select
    # runs on the small (P, P) result.
    @functools.partial(jax.jit, static_argnames=())
    def gather_mxu(imgs_st, meta):
        N2 = meta.shape[1]

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
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (_LW, P), 0)
            lane_j = jax.lax.broadcasted_iota(jnp.int32, (_LW, P), 1)
            for k in range(_B):
                b, dy, dx, cy8, cx128 = addr(k)
                pltpu.make_async_copy(
                    img_ref.at[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)],
                    scratch.at[k], sem.at[k],
                ).wait()
                shift = (lane_c == lane_j + dx).astype(jnp.float32)  # (256, P)
                rolled = jax.lax.dot_general(
                    scratch[k], shift, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (P8, P)
                sel = rolled[7:7 + P, :]
                for r in range(6, -1, -1):
                    sel = jnp.where(dy == r, rolled[r:r + P, :], sel)
                out_ref[k] = sel

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N2 // _B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_B, P8, _LW), jnp.float32),
                pltpu.SemaphoreType.DMA((_B,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N2, P, P), jnp.float32),
            grid_spec=grid_spec,
        )(meta, imgs_st)

    try:
        out10 = gather_mxu(imgs, meta)
        ok10 = np.allclose(np.asarray(out10[:N]), np.asarray(ref_a)) and \
            np.allclose(np.asarray(out10[N:]), np.asarray(ref_b))
        ms_b10 = timeit(lambda: gather_mxu(imgs, meta)) * 1e3
        print(f"B10 per-kp DMA + MXU lane extract    : {ms_b10:7.3f} ms  correct={ok10}")
    except Exception as e:
        print(f"B10 MXU lane extract                 : FAILED ({type(e).__name__}: {e})"[:200])

    # --- B11: VMEM-resident image + MXU lane extraction (B9 x B10) ----------
    @functools.partial(jax.jit, static_argnames=())
    def gather_vmem_mxu(imgs_st, meta):
        N2 = meta.shape[1]

        def kernel(meta_ref, img_ref, out_ref):
            i = pl.program_id(0)
            lane_c = jax.lax.broadcasted_iota(jnp.int32, (_LW, P), 0)
            lane_j = jax.lax.broadcasted_iota(jnp.int32, (_LW, P), 1)
            for k in range(_B):
                b = meta_ref[0, i * _B + k]
                cx = meta_ref[1, i * _B + k]
                cy = meta_ref[2, i * _B + k]
                dy = jax.lax.rem(cy, 8)
                cy8 = cy - dy
                dx = jax.lax.rem(cx, 128)
                cx128 = cx - dx
                band = img_ref[b, pl.ds(cy8, P8), pl.ds(cx128, _LW)]
                shift = (lane_c == lane_j + dx).astype(jnp.float32)
                rolled = jax.lax.dot_general(
                    band, shift, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                sel = rolled[7:7 + P, :]
                for r in range(6, -1, -1):
                    sel = jnp.where(dy == r, rolled[r:r + P, :], sel)
                out_ref[k] = sel

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N2 // _B,),
            in_specs=[pl.BlockSpec(
                (2, H_pad, W_pad), lambda i, m: (0, 0, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_B, P, P), lambda i, m: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N2, P, P), jnp.float32),
            grid_spec=grid_spec,
        )(meta, imgs_st)

    try:
        out11 = gather_vmem_mxu(imgs, meta)
        ok11 = np.allclose(np.asarray(out11[:N]), np.asarray(ref_a)) and \
            np.allclose(np.asarray(out11[N:]), np.asarray(ref_b))
        ms_b11 = timeit(lambda: gather_vmem_mxu(imgs, meta)) * 1e3
        print(f"B11 VMEM-resident + MXU lane extract : {ms_b11:7.3f} ms  correct={ok11}")
    except Exception as e:
        print(f"B11 VMEM-resident + MXU              : FAILED ({type(e).__name__}: {e})"[:200])

    # --- C: XLA dynamic-slice fallback -------------------------------------
    from vloam_tpu.ops.image_ops import _slice_patches

    xla = jax.jit(lambda a, b, c: (_slice_patches(a, c, P), _slice_patches(b, c, P)))
    ms_c = timeit(lambda: xla(img_a, img_b, corners)) * 1e3
    print(f"C XLA vmapped dynamic_slice          : {ms_c:7.3f} ms")


if __name__ == "__main__":
    main()
