"""Batched two-view reconstruction: essential-matrix RANSAC + pose recovery.

Replaces the reference's monocular initializer
(/root/reference/src/TwoViewReconstruction.cc:38-245), which chains
cv::findEssentialMat (USAC_MAGSAC, 1 px, 0.999) + cv::recoverPose + per-match
cv::triangulatePoints with depth/parallax/reprojection gates. Here every
stage is a fixed-shape batch:

  - 8-point hypotheses across RANSAC lanes (one (9,9) eigh per lane),
  - Sampson scoring of all matches by all lanes at once,
  - the 4-way (R, t) decomposition disambiguated by batched cheirality,
  - CheckRT's gates (depth, reprojection <= 4 sigma^2, parallax; 50th-smallest
    parallax > 1 deg; >= max(0.75 * inliers, 50) triangulated) evaluated with
    masked reductions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lie import project_to_so3
from .linalg import smallest_nullvec
from .triangulate import triangulate_rays

N_HYP = 384
MIN_TRIANGULATED = 50
MIN_PARALLAX_DEG = 1.0
COS_HIGH_PARALLAX = 0.99998  # reference's "infinite point" guard


def _essential_from_8pt(r1, r2):
    """Solve E (up to scale) from 8 normalized correspondences.

    r1, r2: (8, 2) normalized coords in frames 1 and 2; constraint
    x2^T E x1 = 0."""
    x1 = jnp.concatenate([r1, jnp.ones((r1.shape[0], 1))], axis=1)
    x2 = jnp.concatenate([r2, jnp.ones((r2.shape[0], 1))], axis=1)
    A = jnp.einsum("ni,nj->nij", x2, x1).reshape(-1, 9)  # rows kron(x2, x1)
    AtA = A.T @ A
    # Nullspace via shifted inverse iteration (ops/linalg): the batched 9x9
    # eigh custom call costs 5.7 ms for 384 lanes on v5e vs ~0.5 ms here.
    # A minimal (8-point) sample solves the constraints exactly, so the
    # solution is already essential up to noise; rank-2 projection of every
    # lane (a batched SVD custom call) is skipped — scoring tolerates the
    # second-order manifold error, and the winning lane is projected during
    # the refit polish below.
    E = smallest_nullvec(AtA, iters=4).reshape(3, 3)
    return E / jnp.maximum(jnp.linalg.norm(E), 1e-12)


def _sampson_err2(E, x1, x2):
    """Squared Sampson distance in normalized coords; x1/x2: (N, 3)."""
    Ex1 = x1 @ E.T  # (N, 3)
    Etx2 = x2 @ E  # (N, 3)
    num = jnp.sum(x2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _decompose_E(E):
    """Four candidate (R, t) with ||t|| = 1 (Hartley-Zisserman)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Ensure rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _check_rt(R, t, r1, r2, mask, sigma2, fx, fy):
    """CheckRT (TwoViewReconstruction.cc:120-245) for one (R, t) candidate.

    r1, r2: (N, 2) normalized coords; mask: (N,) epipolar inliers.
    Returns (n_good, parallax_deg_50th, good (N,), points (N, 3))."""
    X = triangulate_rays(R, t, r1, r2)  # points in camera-1 frame
    finite = jnp.all(jnp.isfinite(X), axis=-1) & (jnp.abs(X) < 1e6).all(axis=-1)

    O2 = -R.T @ t
    n1 = X
    n2 = X - O2[None]
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)

    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    front = ((z1 > 0) | (cos_par >= COS_HIGH_PARALLAX)) & (
        (z2 > 0) | (cos_par >= COS_HIGH_PARALLAX)
    )

    # Reprojection gates at 4*sigma^2 pixels^2 (threshold given in pixels,
    # errors computed in normalized coords and scaled by focal length).
    e1 = (r1[:, 0] - X[:, 0] / jnp.maximum(z1, 1e-9)) ** 2 * fx * fx + (
        r1[:, 1] - X[:, 1] / jnp.maximum(z1, 1e-9)
    ) ** 2 * fy * fy
    e2 = (r2[:, 0] - Xc2[:, 0] / jnp.maximum(z2, 1e-9)) ** 2 * fx * fx + (
        r2[:, 1] - Xc2[:, 1] / jnp.maximum(z2, 1e-9)
    ) ** 2 * fy * fy
    th2 = 4.0 * sigma2

    good = mask & finite & front & (e1 <= th2) & (e2 <= th2) & (z1 > 0) & (z2 > 0)
    strong = good & (cos_par < COS_HIGH_PARALLAX)
    n_good = jnp.sum(good.astype(jnp.int32))

    # 50th-smallest parallax among good points (reference sorts ascending and
    # reads index min(50, size-1)).
    cp = jnp.where(good, cos_par, 2.0)  # invalid -> larger than any cosine
    cp_sorted = jnp.sort(cp)
    idx = jnp.minimum(MIN_TRIANGULATED, jnp.maximum(n_good - 1, 0))
    cp50 = jnp.clip(cp_sorted[idx], -1.0, 1.0)
    parallax_deg = jnp.degrees(jnp.arccos(cp50))
    parallax_deg = jnp.where(n_good > 0, parallax_deg, 0.0)

    return n_good, parallax_deg, strong, X


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def reconstruct_two_views(
    uv1, uv2, valid, fx, fy, cx, cy, key, sigma=1.0, n_hyp=N_HYP
):
    """Full monocular initialization.

    uv1, uv2: (N, 2) matched pixel coords (frame1 -> frame2); valid: (N,).
    Returns dict(ok, R21, t21, points (N,3) in frame-1, triangulated (N,),
    n_inliers)."""
    N = uv1.shape[0]
    r1 = jnp.stack([(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy], axis=-1)
    r2 = jnp.stack([(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy], axis=-1)
    x1 = jnp.concatenate([r1, jnp.ones((N, 1))], axis=1)
    x2 = jnp.concatenate([r2, jnp.ones((N, 1))], axis=1)

    # --- essential RANSAC -------------------------------------------------
    # ONE argsort packs valid indices to the front; lanes then draw uniform
    # positions below n_valid (the per-lane Gumbel top_k over (H, N) cost
    # ~4 ms on v5e). Within-lane duplicate draws yield degenerate systems
    # whose lanes simply lose the MSAC vote.
    n_valid = jnp.sum(valid.astype(jnp.int32))
    order = jnp.argsort(~valid)  # valid indices first, stable
    u = jax.random.randint(key, (n_hyp, 8), 0, jnp.maximum(n_valid, 1))
    samp = order[u]  # (H, 8)
    Es = jax.vmap(_essential_from_8pt)(r1[samp], r2[samp])  # (H, 3, 3)

    # 1 px threshold at the mean focal length (findEssentialMat's default
    # units are pixels on normalized cameras; MAGSAC's marginalization is
    # approximated by the plain inlier count at the same threshold).
    f = 0.5 * (fx + fy)
    thr2 = (sigma / f) ** 2
    err2 = jax.vmap(lambda E: _sampson_err2(E, x1, x2))(Es)  # (H, N)
    inl = (err2 < thr2) & valid[None, :]
    # MSAC scoring: continuous, stable under float noise.
    msac = jnp.sum(jnp.minimum(err2, thr2) * valid[None, :], axis=1)
    best = jnp.argmin(msac)
    E_best = Es[best]

    # Least-squares refit of E on all inliers (weighted 8-point), then
    # rescore — the cheap polish standing in for MAGSAC's sigma-consensus.
    def _refit(E, w):
        A = jnp.einsum("ni,nj->nij", x2, x1).reshape(-1, 9)
        AtA = (A * w[:, None]).T @ A
        Er = smallest_nullvec(AtA, iters=4).reshape(3, 3)
        U, s, Vt = jnp.linalg.svd(Er)  # single 3x3: projection is cheap here
        return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt

    for _ in range(2):
        E_best = _refit(E_best, inl[best].astype(jnp.float32))
        inl_ref = (_sampson_err2(E_best, x1, x2) < thr2) & valid
        inl = inl.at[best].set(inl_ref)

    mask = inl[best]
    n_inl = jnp.sum(mask.astype(jnp.int32))

    # --- pose recovery -----------------------------------------------------
    Rs, ts = _decompose_E(E_best)
    sigma2 = sigma * sigma
    n_goods, parallaxes, goods, Xs = jax.vmap(
        lambda R, t: _check_rt(R, t, r1, r2, mask, sigma2, fx, fy)
    )(Rs, ts)

    pick = jnp.argmax(n_goods)
    n_best = n_goods[pick]
    # recoverPose-style dominance: the winner must clearly beat the others.
    second = jnp.sort(n_goods)[-2]
    dominant = n_best > jnp.maximum(1, (9 * second) // 10)

    min_good = jnp.maximum((3 * n_inl) // 4, MIN_TRIANGULATED)
    ok = (
        (n_inl > 0)
        & dominant
        & (n_best >= min_good)
        & (parallaxes[pick] > MIN_PARALLAX_DEG)
    )

    return {
        "ok": ok,
        "R21": Rs[pick],
        "t21": ts[pick],
        "points": Xs[pick],
        "triangulated": goods[pick] & ok,
        "n_inliers": n_inl,
        "n_good": n_best,
        "parallax_deg": parallaxes[pick],
    }
