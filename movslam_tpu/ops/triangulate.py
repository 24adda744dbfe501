"""Batched two-view DLT triangulation (JAX).

Replaces the reference's per-point cv::triangulatePoints calls
(/root/reference/src/LocalMapping.cc:367, TwoViewReconstruction.cc:177,
GeometricTools.cc:46-65) with one vmapped 4x4 eigen-solve over all matches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate(P1, P2, x1, x2):
    """DLT triangulation.

    P1, P2: (3, 4) projection matrices (any common scale).
    x1, x2: (N, 2) measurements in the respective projective frames
            (pixels if P includes K, normalized coords otherwise).
    Returns (N, 3) points with the homogeneous solution dehomogenized; points
    with w ~ 0 come back huge and must be gated by the caller's depth checks
    (matching `p3d.at<float>(3,0) == 0` skips, TwoViewReconstruction.cc:179).
    """
    rows = [
        x1[:, 0:1] * P1[2:3] - P1[0:1],
        x1[:, 1:2] * P1[2:3] - P1[1:2],
        x2[:, 0:1] * P2[2:3] - P2[0:1],
        x2[:, 1:2] * P2[2:3] - P2[1:2],
    ]
    A = jnp.stack([r for r in rows], axis=1)  # (N, 4, 4)
    # Smallest right-singular vector of A == smallest eigenvector of A^T A.
    AtA = jnp.einsum("nij,nik->njk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., 0]  # (N, 4), eigenvector of smallest eigenvalue
    w = X[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[:, :3] / safe_w[:, None]


def triangulate_rays(R21, t21, r1, r2):
    """Triangulate from normalized rays with camera1 at identity.

    R21, t21: pose of camera2 from camera1. r1, r2: (N, 2) normalized image
    coords (x/z, y/z). Returns points in camera-1 frame (N, 3)."""
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P2 = jnp.concatenate([R21, t21.reshape(3, 1)], axis=1)
    return triangulate(P1, P2, r1, r2)
