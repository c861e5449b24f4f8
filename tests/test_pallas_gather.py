"""Patch-gather primitive (ops/pallas_gather.py).

On CPU this exercises the dynamic_slice fallback; the pallas TPU path is
validated against the same oracle on hardware (see the op's docstring and
tools/profile_vo.py).  The contract tested here is backend-independent:
exact (N, P, P) windows at integer corners."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu.ops.pallas_gather import gather_patches_pair, pad_img


def test_pair_matches_numpy(rng):
    H, W, P = 128, 384, 32
    img0 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img1 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    N = 64
    ca = np.stack([rng.integers(0, W - P, N), rng.integers(0, H - P, N)], -1).astype(np.int32)
    cb = np.stack([rng.integers(0, W - P, N), rng.integers(0, H - P, N)], -1).astype(np.int32)
    A, B = gather_patches_pair(jnp.array(img0), jnp.array(img1),
                               jnp.array(ca), jnp.array(cb), P)
    for k in range(0, N, 7):
        np.testing.assert_array_equal(
            np.asarray(A)[k], img0[ca[k, 1]:ca[k, 1] + P, ca[k, 0]:ca[k, 0] + P])
        np.testing.assert_array_equal(
            np.asarray(B)[k], img1[cb[k, 1]:cb[k, 1] + P, cb[k, 0]:cb[k, 0] + P])


def test_pad_img_bounds(rng):
    """pad_img guarantees every legal DMA band stays in bounds: an 8-aligned
    (P+8)-row band below any corner row <= H-P, and a 128-aligned 256-lane
    band left of any corner col <= W-P."""
    for H, W in ((64, 256), (376, 1241), (375, 1242)):
        img = rng.uniform(0, 255, (H, W)).astype(np.float32)
        padded = np.asarray(pad_img(jnp.array(img)))
        np.testing.assert_array_equal(padded[:H, :W], img)
        P = 32
        assert padded.shape[0] % 8 == 0 and padded.shape[1] % 128 == 0
        assert padded.shape[0] >= (H - P) - (H - P) % 8 + P + 8
        assert padded.shape[1] >= ((W - P) // 128) * 128 + 256
