"""Batched EXPRESS detector/descriptor for 16x16 macroblocks (JAX, TPU-first).

Re-implements the algorithm of /root/reference/include/EXPRESS.h:
  - compute_center (EXPRESS.h:79-88): mean of the 4 central pixels.
  - compute_descriptor (EXPRESS.h:90-110): bit set where |px - center| exceeds
    the threshold (an "extreme" pixel), bit index = row*16 + col.
  - compute_express (EXPRESS.h:117-192): prefilter (>=12.5% extreme pixels),
    then a diagonal "slice tournament" over both diagonal orientations: the
    31 diagonals of the block are scanned in order and the block passes if,
    for either orientation, there is a streak of >= 8 consecutive
    extreme-dominant diagonals AND a streak of >= 8 consecutive
    flat-dominant diagonals. (The reference's win/loss streak counters
    saturate at `rounds`, which is exactly "a run of length >= rounds
    exists".)

Where the reference crops one cv::Mat at a time and walks pixels with raw
pointers, this version processes ALL candidate blocks of a frame in one shot:
the per-diagonal sums for every block are a single (B,256)x(256,62) matmul on
the MXU, and the streak detection is a windowed sum on the VPU.

Intentional divergences from the C++ (documented, covered by golden tests):
  - `center ± threshold` uses saturating arithmetic instead of uint8 wrap
    (EXPRESS.h:92-94 wraps for center < threshold, a latent bug).
  - the descriptor loop's `p++` pre-increment (EXPRESS.h:103) skips column 0
    and reads one past the row; we classify each pixel at its true position.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bitdesc import pack_bits

BLOCK = 16
N_SLICES = 2 * BLOCK - 1  # 31 diagonals per orientation
ROUNDS = int(round(N_SLICES * 0.25))  # 8: required streak length
PRECHECK = int(BLOCK * BLOCK * 0.125)  # 32: minimum extreme pixels


def _build_diag_tables():
    """Membership masks and lengths for both diagonal orientations.

    Mirrors the index tables at EXPRESS.h:20-38: orientation 0 = main
    diagonals (col - row = const), orientation 1 = anti-diagonals
    (row + col = const). Scan order within an orientation only matters up to
    reversal, and streak detection is reversal-invariant.
    """
    idx = np.arange(BLOCK * BLOCK)
    r, c = idx // BLOCK, idx % BLOCK
    main_d = (c - r) + (BLOCK - 1)  # 0..30
    anti_d = (r + c)  # 0..30
    masks = np.zeros((BLOCK * BLOCK, 2 * N_SLICES), np.float32)
    masks[idx, main_d] = 1.0
    masks[idx, N_SLICES + anti_d] = 1.0
    lengths = np.zeros((2 * N_SLICES,), np.float32)
    for d in range(N_SLICES):
        lengths[d] = np.sum(main_d == d)
        lengths[N_SLICES + d] = np.sum(anti_d == d)
    return masks, lengths


_DIAG_MASKS, _DIAG_LENGTHS = _build_diag_tables()


def _has_run(b, run_len):
    """True if boolean (..., N) sequence contains `run_len` consecutive Trues.

    Windowed sum via cumulative sum: any window of size run_len summing to
    run_len is a full run.
    """
    x = b.astype(jnp.int32)
    cs = jnp.cumsum(x, axis=-1)
    pad = jnp.zeros(cs.shape[:-1] + (1,), cs.dtype)
    cs = jnp.concatenate([pad, cs], axis=-1)
    win = cs[..., run_len:] - cs[..., :-run_len]
    return jnp.any(win == run_len, axis=-1)


def block_center(blocks):
    """Mean of the 4 central pixels: (..., 16, 16) -> (...,) f32.

    EXPRESS.h:79-88 (the reference's transposed .at() indexing is symmetric
    over the central 2x2 for square blocks).
    """
    c = blocks[..., BLOCK // 2 - 1 : BLOCK // 2 + 1, BLOCK // 2 - 1 : BLOCK // 2 + 1]
    return jnp.floor(jnp.mean(c.astype(jnp.float32), axis=(-2, -1)))


def extreme_mask(blocks, threshold):
    """Per-pixel extreme classification: (..., 16, 16) -> (..., 256) bool."""
    b = blocks.astype(jnp.float32)
    center = block_center(blocks)[..., None, None]
    ex = jnp.logical_or(b < center - threshold, b > center + threshold)
    return ex.reshape(ex.shape[:-2] + (BLOCK * BLOCK,))


def compute_descriptor(blocks, threshold):
    """Batched descriptor: (..., 16, 16) u8/f32 -> (..., 8) uint32."""
    return pack_bits(extreme_mask(blocks, threshold))


def compute_express(blocks, threshold):
    """Batched detector: (..., 16, 16) -> (...,) bool.

    Returns whether each block passes the EXPRESS cornerness test.
    """
    ex = extreme_mask(blocks, threshold)
    prefilter = jnp.sum(ex, axis=-1) >= PRECHECK

    masks = jnp.asarray(_DIAG_MASKS)
    lengths = jnp.asarray(_DIAG_LENGTHS)
    # One MXU matmul yields every diagonal's extreme count for both
    # orientations at once: (..., 256) @ (256, 62).
    sums = jnp.matmul(ex.astype(jnp.float32), masks, preferred_element_type=jnp.float32)
    # A diagonal "wins" when extreme pixels are at least half its length
    # (win >= loss at EXPRESS.h:169); "loses" otherwise (loss > win).
    winb = sums * 2.0 >= lengths

    w_main, w_anti = winb[..., :N_SLICES], winb[..., N_SLICES:]
    ok_main = jnp.logical_and(_has_run(w_main, ROUNDS), _has_run(~w_main, ROUNDS))
    ok_anti = jnp.logical_and(_has_run(w_anti, ROUNDS), _has_run(~w_anti, ROUNDS))
    return jnp.logical_and(prefilter, jnp.logical_or(ok_main, ok_anti))


def detect_and_describe(blocks, threshold):
    """Fused detector + descriptor over a batch of blocks.

    blocks: (B, 16, 16) uint8/f32. Returns (pass (B,) bool, desc (B, 8) u32).
    The extreme mask is computed once and shared (the reference recomputes it
    in compute_descriptor after compute_express).
    """
    ex = extreme_mask(blocks, threshold)
    prefilter = jnp.sum(ex, axis=-1) >= PRECHECK
    masks = jnp.asarray(_DIAG_MASKS)
    lengths = jnp.asarray(_DIAG_LENGTHS)
    sums = jnp.matmul(ex.astype(jnp.float32), masks, preferred_element_type=jnp.float32)
    winb = sums * 2.0 >= lengths
    w_main, w_anti = winb[..., :N_SLICES], winb[..., N_SLICES:]
    ok_main = jnp.logical_and(_has_run(w_main, ROUNDS), _has_run(~w_main, ROUNDS))
    ok_anti = jnp.logical_and(_has_run(w_anti, ROUNDS), _has_run(~w_anti, ROUNDS))
    passed = jnp.logical_and(prefilter, jnp.logical_or(ok_main, ok_anti))
    return passed, pack_bits(ex)


def gather_blocks(img, tl_xy, size=BLOCK):
    """Gather `size`x`size` blocks at integer top-left (x, y) coords.

    img: (H, W) array; tl_xy: (B, 2) int32 (x, y). Out-of-range coords are
    clamped; callers gate validity separately. Returns (B, size, size) f32.

    TPU-first: expressed as two one-hot selection MATMULS on the MXU instead
    of per-element gathers (profiling the production scan showed the XLA
    gather lowering at ~21 ms/frame for 8k blocks — the scalar-core path the
    Pallas guide warns about). bf16 one-hots and u8-range pixels are exact
    (integers < 256 carry 8 mantissa bits); accumulation is f32.
    """
    H, W = img.shape
    B = tl_xy.shape[0]
    x0 = jnp.clip(tl_xy[:, 0], 0, W - size)
    y0 = jnp.clip(tl_xy[:, 1], 0, H - size)
    d = jnp.arange(size, dtype=jnp.int32)
    yi = y0[:, None] + d[None, :]  # (B, size)
    xi = x0[:, None] + d[None, :]
    hi = jnp.arange(H, dtype=jnp.int32)
    wi = jnp.arange(W, dtype=jnp.int32)
    Wy = (hi[None, None, :] == yi[:, :, None]).astype(jnp.bfloat16)
    Wx = (wi[None, None, :] == xi[:, :, None]).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        Wy.reshape(B * size, H), img.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(B, size, W)
    return jnp.einsum(
        "bkw,bjw->bkj", rows.astype(jnp.bfloat16), Wx,
        preferred_element_type=jnp.float32,
    )


def describe_at(img, centers_xy, threshold):
    """Descriptors for blocks centered at (x, y): (B,2) f32/int -> (B,8) u32.

    Matches the reference's cv::Rect(pt.x - 8, pt.y - 8, 16, 16) cropping with
    integer truncation of the center coordinates (MOVExtractor.cc:284).
    """
    tl = centers_xy.astype(jnp.int32) - BLOCK // 2
    blocks = gather_blocks(img, tl)
    return compute_descriptor(blocks, threshold)


@functools.partial(jax.jit, static_argnames=("stride",))
def dense_grid_detect(img, threshold, stride=BLOCK):
    """Dense grid EXPRESS scan of a full image (MOVExtractor.cc:39-61).

    Grid centers at (x, y) = (8 + i*stride, 8 + j*stride) with the reference's
    bounds: center < dim - 8 and tl + 16 < dim (strict).

    Returns (centers (G, 2) f32, passed (G,) bool, desc (G, 8) u32) where G is
    the static grid size for this image shape.
    """
    H, W = img.shape
    half = BLOCK // 2
    xs = np.arange(half, W - half, stride)
    ys = np.arange(half, H - half, stride)
    xs = xs[(xs - half + BLOCK) < W]
    ys = ys[(ys - half + BLOCK) < H]
    cx, cy = np.meshgrid(xs, ys)
    centers = jnp.asarray(
        np.stack([cx.ravel(), cy.ravel()], axis=-1).astype(np.float32)
    )
    tl = centers.astype(jnp.int32) - half
    blocks = gather_blocks(img, tl)
    passed, desc = detect_and_describe(blocks, threshold)
    return centers, passed, desc


def save_express_file(path, img, threshold):
    """Debug dump: white image with descriptor bits of every detected block
    painted black (save_express_file, EXPRESS.h:194-229) — batched over the
    dense pixel grid instead of the reference's per-pixel loop."""
    imgj = jnp.asarray(img)
    H, W = img.shape
    half = BLOCK // 2
    ys, xs = np.meshgrid(
        np.arange(half, H - half), np.arange(half, W - half), indexing="ij"
    )
    centers = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.int32)
    out = np.full((H, W), 255, np.uint8)
    # Chunked to bound memory: every center's block described + detected.
    for i in range(0, len(centers), 8192):
        c = centers[i : i + 8192]
        tl = jnp.asarray(c) - half
        blocks = gather_blocks(imgj, tl)
        passed, desc = detect_and_describe(blocks, threshold)
        passed = np.asarray(passed)
        from .bitdesc import unpack_bits

        dbits = np.asarray(unpack_bits(desc)).astype(bool).reshape(-1, BLOCK, BLOCK)
        for k in np.flatnonzero(passed):
            x0, y0 = c[k, 0] - half, c[k, 1] - half
            blk = out[y0 : y0 + BLOCK, x0 : x0 + BLOCK]
            blk[dbits[k]] = 0
    try:
        import cv2

        cv2.imwrite(path, out)
    except ImportError:
        np.save(path + ".npy", out)
    return out
