"""Pallas TPU kernels for the hot gather-compute paths.

The MV-propagation scoring step gathers a 16x16 pixel block for every
(track, candidate) pair and computes an EXPRESS descriptor + Hamming
distance (ops/propagate.py). XLA lowers the coordinate-dependent gather to
a generic gather op; this kernel instead:

  1. DMAs a TILE-ALIGNED 64-row x full-width band of the image from HBM to
     VMEM per candidate (dynamic DMA starts must be provably aligned on
     TPU — `pl.multiple_of` on a rounded-down row),
  2. selects the 16x16 block with one-hot row/column selection MATMULS on
     the MXU (the canonical TPU answer to lane-dimension dynamic slicing),
  3. fuses the EXPRESS descriptor pack (exact power-of-two matmuls — note
     jnp.exp2 is approximate!) and the XOR-popcount Hamming distance.

Exported:
  score_blocks(img, tl_xy, prev_desc, threshold) ->
      (dist (B,) int32, desc (B, 8) uint32)

Semantics match ops/express.compute_descriptor + ops/bitdesc.hamming on
blocks gathered at clamped top-left coords (express.gather_blocks); verified
bit-exact in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 16
TB = 8  # blocks handled per grid step
BAND = 64  # aligned row band DMA'd per block (u8 sublane tile = 32)


def _score_kernel(tl_ref, thr_ref, img_hbm, prev_desc_ref, dist_ref, desc_ref,
                  scratch, sems):
    """Grid step: DMA TB row-bands (double-buffered), select, describe."""
    step = pl.program_id(0)
    H, W = img_hbm.shape

    def coords(b):
        packed = tl_ref[step * TB + b]
        return packed & 0xFFFF, packed >> 16  # (x0, y0)

    def band_start(b):
        _, y0 = coords(b)
        ya = jnp.minimum((y0 // 32) * 32, H - BAND)
        return pl.multiple_of(ya, 32)

    def dma(slot, b):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(band_start(b), BAND), :],
            scratch.at[slot],
            sems.at[slot],
        )

    dma(0, 0).start()

    def body(b, _):
        slot = jax.lax.rem(b, 2)
        nxt = jax.lax.rem(b + 1, 2)

        @pl.when(b + 1 < TB)
        def _():
            dma(nxt, b + 1).start()

        dma(slot, b).wait()
        idx = step * TB + b
        x0, y0 = coords(b)
        y_off = y0 - band_start(b)

        # Mosaic lacks a direct u8->f32 cast; hop through int32.
        band = scratch[slot].astype(jnp.int32).astype(jnp.float32)  # (64, W)

        # One-hot selection matmuls replace dynamic sublane/lane slicing.
        rsel_r = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BAND), 0)
        rsel_c = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BAND), 1)
        RowSel = jnp.where(rsel_c == rsel_r + y_off, 1.0, 0.0)  # (16, 64)
        csel_r = jax.lax.broadcasted_iota(jnp.int32, (W, BLOCK), 0)
        csel_c = jax.lax.broadcasted_iota(jnp.int32, (W, BLOCK), 1)
        ColSel = jnp.where(csel_r == csel_c + x0, 1.0, 0.0)  # (W, 16)

        HI = jax.lax.Precision.HIGHEST  # MXU bf16x3 f32 emulation flips
        # low bits on large-magnitude sums; force the exact path.
        rows = jnp.dot(RowSel, band, preferred_element_type=jnp.float32, precision=HI)
        blk = jnp.dot(rows, ColSel, preferred_element_type=jnp.float32, precision=HI)

        center = jnp.floor(
            (blk[7, 7] + blk[7, 8] + blk[8, 7] + blk[8, 8]) * 0.25
        )
        thr = thr_ref[0]
        ex = jnp.where(
            jnp.logical_or(blk < center - thr, blk > center + thr), 1.0, 0.0
        )  # (16, 16) f32 — Mosaic can't reshape i1 vectors, stay float

        # Pack 256 bits -> 8 words via EXACT f32 matmuls (row sums < 2^16):
        # rowpack[r] = sum_c ex[r, c] * 2^c, word w = rows (2w | 2w+1 << 16).
        col_pow = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        P16 = (jnp.int32(1) << col_pow).astype(jnp.float32)  # 2^c EXACT
        S = ex * P16
        ones_row = jnp.ones((1, 16), jnp.float32)
        rowpack = jax.lax.dot_general(
            ones_row, S, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )  # (1, 16): entry r = sum_c S[r, c]
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (16, 8), 0)
        word_idx = jax.lax.broadcasted_iota(jnp.int32, (16, 8), 1)
        L_even = jnp.where(row_idx == 2 * word_idx, 1.0, 0.0)
        L_odd = jnp.where(row_idx == 2 * word_idx + 1, 1.0, 0.0)
        lo = jnp.dot(rowpack, L_even, preferred_element_type=jnp.float32, precision=HI)
        hi = jnp.dot(rowpack, L_odd, preferred_element_type=jnp.float32, precision=HI)
        words = lo.astype(jnp.int32) + hi.astype(jnp.int32) * 65536  # (1, 8)

        prev = prev_desc_ref[pl.ds(idx, 1), :]  # (1, 8) int32 bit pattern
        dist = jnp.sum(
            jax.lax.population_count(words ^ prev).astype(jnp.int32)
        )
        dist_ref[pl.ds(idx, 1), :] = dist.reshape(1, 1)
        desc_ref[pl.ds(idx, 1), :] = words
        return 0

    jax.lax.fori_loop(0, TB, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_blocks(img, tl_xy, prev_desc, threshold, interpret=False):
    """Fused gather + EXPRESS descriptor + Hamming for B candidate blocks.

    img: (H, W) uint8 (W a multiple of 128, H >= 64); tl_xy: (B, 2) int32
    top-left (x, y); prev_desc: (B, 8) uint32; threshold: scalar.
    B must be a multiple of TB."""
    B = tl_xy.shape[0]
    H, W = img.shape
    if B % TB != 0 or W % 128 != 0 or H < BAND:
        # Shapes the band-DMA kernel can't serve: fall back to the XLA path
        # (bit-identical semantics).
        from . import bitdesc, express

        blocks = express.gather_blocks(img.astype(jnp.float32), tl_xy)
        desc = express.compute_descriptor(blocks, threshold)
        return bitdesc.hamming(desc, prev_desc), desc

    tl = jnp.clip(tl_xy, 0, jnp.array([W - BLOCK, H - BLOCK]))
    # Pack (x, y) into one int32 per candidate: scalar-prefetch operands are
    # lane-padded in SMEM, so a (B, 2) array costs B*128 words.
    tl_packed = (tl[:, 1] << 16) | tl[:, 0]
    thr = jnp.asarray([threshold], jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tl + thr in SMEM (DMA index computation)
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # img stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prev_desc
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BAND, img.shape[1]), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    prev_i32 = jax.lax.bitcast_convert_type(prev_desc, jnp.int32)
    dist, desc = pl.pallas_call(
        _score_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tl_packed, thr, img, prev_i32)
    return dist[:, 0], jax.lax.bitcast_convert_type(desc, jnp.uint32)
