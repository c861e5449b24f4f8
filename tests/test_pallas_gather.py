"""Patch-gather primitive (ops/pallas_gather.py).

On CPU this exercises the dynamic_slice fallback; the pallas TPU path is
validated against the same oracle on hardware (see the op's docstring and
tools/profile_vo.py).  The contract tested here is backend-independent:
exact (N, P, P) windows at integer corners."""

import numpy as np
import jax.numpy as jnp

from vloam_tpu.ops.pallas_gather import gather_patches_pair, make_img8


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


def test_img8_row_identity(rng):
    """img8[r, y] == img[y + r] — the row-alignment trick's contract."""
    img = rng.uniform(0, 255, (64, 256)).astype(np.float32)
    i8 = np.asarray(make_img8(jnp.array(img)))
    for r in range(8):
        np.testing.assert_array_equal(i8[r, : 64 - r, :256], img[r:, :])
