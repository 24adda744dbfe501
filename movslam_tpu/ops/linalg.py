"""Fast batched small-matrix linear algebra for TPU.

XLA lowers `jnp.linalg.{solve,inv,eigh,svd}` to LAPACK-style custom calls
that serialize on the TPU scalar core — measured on v5e: a (4096,4,4) eigh
costs 15.4 ms, a (2048,3,3) inv 2.3 ms, a (256,12,12) LU solve 1.4 ms. The
closed-form / unrolled equivalents below run entirely on the VPU as plain
vector ops: 0.75 ms, 0.54 ms and 0.63 ms respectively for the same shapes.

Every routine is batched over arbitrary leading dimensions and jit-safe.
Used by ops/triangulate (DLT), ops/ba + ops/vi_ba (Schur point blocks,
reduced camera solve), ops/pnp (DLT inverse iteration, GN steps) and
ops/twoview (8-point nullspace) — the reference reaches the same math
through cv::triangulatePoints / g2o+CSparse / cv::solvePnPRansac
(/root/reference/src/Optimizer.cc:397-841, GeometricTools.cc:46-65).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def det3x3(A):
    """Batched 3x3 determinant (closed form)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def inv3x3(A, eps=0.0):
    """Batched 3x3 inverse via the adjugate (closed form, VPU-only).

    eps > 0 guards the determinant against exact singularity (the result for
    a singular block is then finite garbage the caller must mask)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    idet = 1.0 / jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det) if eps else 1.0 / det
    rows = [
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ]
    return jnp.stack(rows, -2) * idet[..., None, None]


def solve3x3(A, b, eps=1e-30):
    """Batched 3x3 solve via Cramer/adjugate. Returns (x, det)."""
    inv = inv3x3(A, eps=eps)
    return jnp.einsum("...ij,...j->...i", inv, b), det3x3(A)


def cholesky_unrolled(S):
    """Batched Cholesky of a small (n<=~16) SPD matrix, fully unrolled.

    Every scalar op is a batched VPU op over the leading dims — no LAPACK
    custom call, no scalar-core serialization. Returns the lower factor as a
    Python list-of-lists L[i][j] (i>=j) of (...,) arrays."""
    n = S.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = S[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
        for i in range(j + 1, n):
            s = S[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]
    return L


def chol_substitute(L, b):
    """Forward+back substitution with an unrolled factor from
    cholesky_unrolled. b: (..., n). Lets callers factor once and solve many
    right-hand sides (e.g. inverse iteration)."""
    n = len(L)
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def chol_solve_small(S, b):
    """Batched SPD solve for small n via unrolled Cholesky.

    S: (..., n, n) symmetric positive definite, b: (..., n). Returns (..., n).
    ~2x faster than jnp.linalg.solve's batched LU at n=6..12 on TPU, and
    avoids the custom-call serialization entirely."""
    return chol_substitute(cholesky_unrolled(S), b)


def solve_psd(S, b):
    """SPD solve for one large (n x n) system via XLA Cholesky + triangular
    solves (faster than LU on TPU: 0.76 vs 0.87 ms at n=288, 1.6 vs 2.8 ms at
    n=720). Falls back numerically like LU — a non-PD input yields NaNs the
    caller's acceptance logic must reject (LM already does)."""
    return jax.scipy.linalg.cho_solve((jnp.linalg.cholesky(S), True), b)


def smallest_nullvec(AtA, iters=4, ridge=1e-5):
    """Batched smallest-eigenvector of a small SPD Gram matrix via shifted
    inverse iteration with the unrolled Cholesky.

    AtA: (..., n, n) Gram matrix whose smallest eigenvalue is ~0 (an
    (over-)determined homogeneous system A x = 0). Returns a unit-norm
    (..., n) vector. The spectral gap of such systems is huge (lambda_min ~
    noise^2, lambda_2 ~ signal), so a handful of iterations converge; the
    ridge bounds the condition number of the factorization.

    Replaces jnp.linalg.eigh(...)[1][..., 0]: 5.7 ms -> ~0.5 ms for
    (384, 9, 9) on v5e."""
    n = AtA.shape[-1]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    S = AtA + (ridge * tr / n + 1e-20) * jnp.eye(n, dtype=AtA.dtype)
    L = cholesky_unrolled(S)

    # Deterministic start with nonzero overlap on any direction.
    v = jnp.broadcast_to(
        jnp.arange(1, n + 1, dtype=AtA.dtype) / n, AtA.shape[:-1]
    )
    for _ in range(iters):
        v = chol_substitute(L, v)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)
        # Degenerate inputs (singular even with ridge) go non-finite; reset
        # those batch entries to a harmless direction.
        v = jnp.where(jnp.isfinite(v), v, 1.0 / n)
    return v
