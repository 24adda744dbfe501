"""Batched motion-vector candidate selection (TPU-native `mvi` replacement).

The reference builds a per-pixel H x W x 4 index image (`mvi`) on the CPU by
stamping every MV's source rectangle pixel-by-pixel (VideoDecoder.cc:330-345),
then each track does an O(1) pixel lookup (MOVExtractor.cc:265-299). On TPU we
invert the computation: the (track, mv) containment relation is evaluated
directly as a dense (N_tracks x N_mvs) predicate on the VPU and reduced to the
first-4-in-insertion-order candidates per track — identical semantics to the
4-slot pixel image, with no scatter and no host loop.

With N = 1024 tracks and M = 4096 MVs the containment matrix is 4M lanes of
compare/select — microseconds on a TPU core.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

N_CAND = 4  # the reference's 4 mvi slots per pixel


def candidate_mvs(track_pt, track_valid, mv_rect, mv_valid):
    """First-4 MV candidates per track, in MV insertion order.

    track_pt: (N, 2) f32 current track positions (x, y).
    track_valid: (N,) bool.
    mv_rect: (M, 4) f32 inclusive source-rect bounds (x0, y0, x1, y1).
    mv_valid: (M,) bool.

    Returns cand_idx (N, 4) int32 — MV indices or -1 — matching the semantics
    of reading mvi at the truncated integer pixel of each track
    (MOVExtractor.cc:264-270): slot k holds the (k+1)-th MV whose source rect
    contains the pixel, in increasing MV index order (insertion order).
    """
    ix = jnp.floor(track_pt[:, 0]).astype(jnp.int32)
    iy = jnp.floor(track_pt[:, 1]).astype(jnp.int32)
    fx = ix.astype(jnp.float32)[:, None]  # (N, 1)
    fy = iy.astype(jnp.float32)[:, None]

    x0, y0, x1, y1 = mv_rect[:, 0], mv_rect[:, 1], mv_rect[:, 2], mv_rect[:, 3]
    contains = (
        (fx >= x0[None, :])
        & (fx <= x1[None, :])
        & (fy >= y0[None, :])
        & (fy <= y1[None, :])
    )
    contains = contains & mv_valid[None, :] & track_valid[:, None]  # (N, M)

    # Rank of each hit within its row = number of hits strictly before it.
    rank = jnp.cumsum(contains.astype(jnp.int32), axis=1) - 1
    m_idx = jnp.arange(mv_rect.shape[0], dtype=jnp.int32)[None, :]

    def slot(k):
        hit_k = contains & (rank == k)
        # At most one column matches; extract its index (or -1).
        idx = jnp.max(jnp.where(hit_k, m_idx, -1), axis=1)
        return idx

    cand = jnp.stack([slot(k) for k in range(N_CAND)], axis=1)  # (N, 4)
    return cand


def point_covered(pts, mv_rect, mv_valid):
    """Whether any valid MV source rect contains each point (N,2) -> (N,) bool.

    Equivalent to `mvi.at(y, x)[0] >= 0` (MOVExtractor.cc:431)."""
    ix = jnp.floor(pts[:, 0]).astype(jnp.float32)[:, None]
    iy = jnp.floor(pts[:, 1]).astype(jnp.float32)[:, None]
    x0, y0, x1, y1 = mv_rect[:, 0], mv_rect[:, 1], mv_rect[:, 2], mv_rect[:, 3]
    contains = (
        (ix >= x0[None, :])
        & (ix <= x1[None, :])
        & (iy >= y0[None, :])
        & (iy <= y1[None, :])
        & mv_valid[None, :]
    )
    return jnp.any(contains, axis=1)
