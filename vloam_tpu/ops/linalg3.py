"""Closed-form batched 3x3 symmetric linear algebra.

jnp.linalg.eigh on big batches of tiny matrices maps poorly onto TPU (it
lowers to a loop-heavy custom call); the analytic trigonometric eigensolver
is a few dozen vectorised flops per matrix and fuses into the surrounding
kernel.  Used by the mapping line/plane fits (reference: Eigen
SelfAdjointEigenSolver at laser_mapping.cpp:583 and colPivHouseholderQr at
laser_mapping.cpp:655).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigh3x3(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns (eigvals (..., 3) ascending, eigvecs (..., 3, 3) with columns as
    eigenvectors), matching Eigen's SelfAdjointEigenSolver convention.
    Analytic method: Deledalle et al. closed form + cross-product vectors.
    """
    a = A[..., 0, 0]
    b = A[..., 1, 1]
    c = A[..., 2, 2]
    d = A[..., 0, 1]
    e = A[..., 1, 2]
    f = A[..., 0, 2]

    tr = a + b + c
    q = tr / 3.0
    p1 = d * d + f * f + e * e
    p2 = (a - q) ** 2 + (b - q) ** 2 + (c - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    # B = (A - q I) / p ; r = det(B)/2 in [-1, 1]
    Bq = (A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / p[..., None, None]
    r = jnp.linalg.det(Bq) / 2.0
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e3 = q + 2.0 * p * jnp.cos(phi)                       # largest
    e1 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = tr - e1 - e3
    vals = jnp.stack([e1, e2, e3], axis=-1)

    # Degenerate (isotropic) guard
    iso = p2 < 1e-20
    vals = jnp.where(iso[..., None], jnp.stack([a, b, c], axis=-1), vals)

    def eigvec(lam):
        # rows of (A - lam I); eigenvector is orthogonal to two independent rows
        M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        best = jnp.where(n01 >= n02, c01, c02)
        bestn = jnp.maximum(n01, n02)
        best = jnp.where(bestn >= n12, best, c12)
        bestn = jnp.maximum(bestn, n12)
        v = best / jnp.sqrt(jnp.maximum(bestn, 1e-30))
        # isotropic fallback: any axis
        return jnp.where(bestn < 1e-24, jnp.array([1.0, 0.0, 0.0], A.dtype), v)

    v1 = eigvec(vals[..., 0])
    v3 = eigvec(vals[..., 2])
    v2 = jnp.cross(v3, v1)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-30)
    vecs = jnp.stack([v1, v2, v3], axis=-1)  # columns
    return vals, vecs


def solve_spd_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for a small SPD matrix (e.g. the 6x6 GN normal matrix)
    with an unrolled Cholesky — pure scalar jnp ops that XLA fuses into the
    surrounding kernel.  jnp.linalg.solve lowers to an LU custom call that
    costs milliseconds per invocation on TPU for tiny systems; this is
    effectively free."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Cramer's-rule solve for (..., 3, 3) @ x = (..., 3)."""
    det = jnp.linalg.det(A)
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)

    def rep(i):
        return jnp.linalg.det(A.at[..., :, i].set(b))

    x = jnp.stack([rep(0), rep(1), rep(2)], axis=-1)
    return x / det[..., None]
