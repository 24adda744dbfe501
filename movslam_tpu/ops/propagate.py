"""Motion-vector track propagation — the device heart of the feature layer.

Re-implements the P-frame path of the reference's MOVExtractor
(/root/reference/src/MOVExtractor.cc:245-451) as one jitted, fixed-shape
program. Where the reference walks features one-by-one in a priority order,
this version evaluates every (track, candidate) pair in parallel and resolves
the order-dependent destination-block claiming with a scatter-min over
priority ranks — bit-identical claim semantics, no sequential loop:

  reference (per track, in sorted order)            this file (batched)
  ------------------------------------------        -----------------------
  sort by (age desc, desc popcount desc)            priority rank (argsort)
  mvi pixel lookup -> <=4 candidates                point-in-rect join
  best-of-4 by Hamming distance                     vectorized argmin
  lbFound[dIndx] claim (first wins)                 scatter-min of rank
  accept if Hamming <= 40                           masked accept
  unclaimed kps -> EXPRESS seeds, new ids           masked prefix-sum ids
  low coverage -> dense-grid fallback               dense_grid_detect

Intentional divergence (documented): descriptors are always computed on a
16x16 block centered at the feature position, regardless of the macroblock
partition size the codec reported (the reference crops pvf.mb-sized blocks,
MOVExtractor.cc:284-290); descriptors are only ever compared frame-to-frame
computed the same way, so matching behavior is preserved while shapes stay
static.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import express
from .bitdesc import hamming, popcount
from .mvselect import N_CAND, candidate_mvs, point_covered

ACCEPT_HAMMING = 40  # MOVExtractor.cc:316
MIN_SEED_COUNT = 60  # MOVExtractor.cc:418 fallback gate

import os


def _use_pallas_score():
    """Pallas candidate scoring (ops/pallas_kernels.py): bit-exact with the
    XLA path, kept for reference/experimentation but OFF by default — a
    round-2 profiler trace showed the XLA gather+matmul path at ~2 ms/frame
    vs ~8 ms/frame for the hand-rolled kernel on v5e (XLA's native lowering
    of block gathers beats the double-buffered band DMA here). Override with
    MOVSLAM_PALLAS=1."""
    env = os.environ.get("MOVSLAM_PALLAS")
    if env is not None:
        return env != "0"
    return False


def priority_rank(valid, age, desc):
    """Rank tracks by (age desc, descriptor popcount desc); invalid last.

    Mirrors the sort at MOVExtractor.cc:249-252. Returns (N,) i32 where 0 is
    the highest-priority track.
    """
    pc = popcount(desc)
    key = jnp.minimum(age, 1 << 21) * 512 + pc  # int32-safe lexicographic key
    key = jnp.where(valid, key, -1)
    order = jnp.argsort(-key)  # descending; invalid (-1) go last
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return rank.astype(jnp.int32)


def _block_inbounds(pt, wh, width, height):
    """Reference bounds check: tl >= 0 and tl + wh < dim (strict)."""
    tlx = jnp.floor(pt[..., 0]).astype(jnp.int32) - (wh[..., 0] / 2).astype(jnp.int32)
    tly = jnp.floor(pt[..., 1]).astype(jnp.int32) - (wh[..., 1] / 2).astype(jnp.int32)
    return (
        (tlx >= 0)
        & (tly >= 0)
        & (tlx + wh[..., 0].astype(jnp.int32) < width)
        & (tly + wh[..., 1].astype(jnp.int32) < height)
    )


def propagate_mv_tracks(
    img,
    prev_pt,
    prev_valid,
    prev_coverage,
    prev_age,
    prev_desc,
    prev_wh,
    mv_delta,
    mv_rect,
    mv_dindx,
    mv_valid,
    n_kps_capacity,
    threshold,
):
    """Core MV propagation (MOVExtractor.cc:245-335), batched.

    Returns dict with per-track results:
      new_pt (N,2), accepted (N,) bool, new_desc (N,8), dist (N,),
      kp_claimed (K,) bool — lbFound, for seed suppression.
    """
    H, W = img.shape
    imgf = img.astype(jnp.float32)
    N = prev_pt.shape[0]

    mv_track = prev_valid & ~prev_coverage
    cand = candidate_mvs(prev_pt, mv_track, mv_rect, mv_valid)  # (N, 4)
    has_cand = cand[:, 0] >= 0
    multi = cand[:, 1] >= 0

    # Score all 4 candidates: position shift + 16x16 descriptor + Hamming.
    cand_safe = jnp.maximum(cand, 0)
    deltas = mv_delta[cand_safe]  # (N, 4, 2)
    cand_pt = prev_pt[:, None, :] + deltas  # (N, 4, 2)
    cand_inb = _block_inbounds(cand_pt, prev_wh[:, None, :], W, H)  # (N, 4)

    tl = cand_pt.astype(jnp.int32).reshape(-1, 2) - express.BLOCK // 2
    if _use_pallas_score():
        # Fused Pallas kernel: band DMA + one-hot selection matmuls +
        # descriptor pack + popcount; bit-exact with the XLA path and
        # measured faster on v5e (ops/pallas_kernels.py).
        from .pallas_kernels import score_blocks

        prev_rep = jnp.repeat(prev_desc, N_CAND, axis=0)  # (N*4, 8)
        dist_flat, desc_flat = score_blocks(img, tl, prev_rep, threshold)
        cand_desc = desc_flat.reshape(N, N_CAND, 8)
        cand_dist = dist_flat.reshape(N, N_CAND)
    else:
        blocks = express.gather_blocks(imgf, tl)  # (N*4, 16, 16)
        cand_desc = express.compute_descriptor(blocks, threshold).reshape(N, N_CAND, 8)
        cand_dist = hamming(prev_desc[:, None, :], cand_desc)  # (N, 4)

    # Invalid/out-of-bounds candidates never win the argmin (dist -> inf);
    # the reference keeps slot-0 if nothing scores strictly below 256.
    usable = (cand >= 0) & cand_inb
    score = jnp.where(usable, cand_dist, 10_000)
    best_j = jnp.argmin(score, axis=1)
    best_beats = jnp.min(score, axis=1) < 256
    # Single-candidate tracks skip the tournament (MOVExtractor.cc:272).
    chosen_j = jnp.where(multi & best_beats, best_j, 0)

    rows = jnp.arange(N)
    chosen = cand[rows, chosen_j]
    chosen_safe = jnp.maximum(chosen, 0)
    new_pt = cand_pt[rows, chosen_j]
    new_desc = cand_desc[rows, chosen_j]
    dist = cand_dist[rows, chosen_j]
    inb = cand_inb[rows, chosen_j]
    dindx = jnp.where(has_cand, mv_dindx[chosen_safe], -1)

    # Destination-block claiming: processed tracks claim dIndx in priority
    # order regardless of the later distance check (MOVExtractor.cc:306-309).
    rank = priority_rank(prev_valid, prev_age, prev_desc)
    eligible = mv_track & has_cand & inb
    claim_target = jnp.where(eligible & (dindx >= 0), dindx, n_kps_capacity)
    winner_rank = jnp.full((n_kps_capacity + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    winner_rank = winner_rank.at[claim_target].min(jnp.where(eligible, rank, jnp.iinfo(jnp.int32).max))
    wins = (dindx < 0) | (rank == winner_rank[jnp.where(dindx >= 0, dindx, 0)])

    accepted = eligible & wins & (dist <= ACCEPT_HAMMING)

    kp_claimed = jnp.zeros((n_kps_capacity,), jnp.bool_)
    kp_claimed = kp_claimed.at[jnp.where(eligible & (dindx >= 0), dindx, n_kps_capacity - 1)].max(
        eligible & (dindx >= 0)
    )

    return {
        "new_pt": new_pt,
        "accepted": accepted,
        "new_desc": new_desc,
        "dist": dist,
        "kp_claimed": kp_claimed,
    }


def seed_new_tracks(img, kps_rect, kps_valid, kp_claimed, threshold, width, height):
    """New tracks from unclaimed MV destination blocks (MOVExtractor.cc:379-416).

    Returns (pt (K,2), desc (K,8), accept (K,) bool, seed_order (K,) i32) —
    seed_order is each accepted seed's index in scan order (for sequential id
    assignment matching mCurrentId++).
    """
    imgf = img.astype(jnp.float32)
    x, y, w, h = kps_rect[:, 0], kps_rect[:, 1], kps_rect[:, 2], kps_rect[:, 3]
    pt = jnp.stack([x + w * 0.5, y + h * 0.5], axis=-1)
    inb = (x >= 0) & (y >= 0) & (x + w < width) & (y + h < height)

    tl = pt.astype(jnp.int32) - express.BLOCK // 2
    blocks = express.gather_blocks(imgf, tl)
    passed, desc = express.detect_and_describe(blocks, threshold)

    accept = kps_valid & ~kp_claimed & inb & passed
    seed_order = jnp.cumsum(accept.astype(jnp.int32)) - 1
    return pt, desc, accept, seed_order
