"""Scalar NumPy transcription of the EXPRESS algorithm for golden testing.

This mirrors the *intended* semantics of /root/reference/include/EXPRESS.h
as an independent, loop-by-loop scalar implementation: center from the 4
central pixels, saturating threshold bounds, per-pixel extreme classification,
prefilter, and the win/loss streak tournament over both diagonal orientations
with the reference's streak-counter update rule (EXPRESS.h:147-190) written
literally. The vectorized JAX implementation must agree exactly with this.
"""
import numpy as np

BLOCK = 16
N_SLICES = 31
ROUNDS = 8  # round(31 * 0.25)


def center_of(block):
    b = block.astype(np.float64)
    c = b[7:9, 7:9]
    return np.floor(c.mean())


def extreme(block, threshold):
    b = block.astype(np.float64)
    c = center_of(block)
    return (b < c - threshold) | (b > c + threshold)


def descriptor_bits(block, threshold):
    """(16,16) -> (256,) bool, bit index = row*16 + col."""
    return extreme(block, threshold).reshape(-1)


def hamming(bits1, bits2):
    return int(np.sum(bits1 ^ bits2))


def _diag_slices(orientation):
    """Pixel index lists per diagonal. orientation 0: main (col-row const),
    1: anti (row+col const)."""
    out = []
    for d in range(N_SLICES):
        pix = []
        for r in range(BLOCK):
            for c in range(BLOCK):
                key = (c - r) + (BLOCK - 1) if orientation == 0 else (r + c)
                if key == d:
                    pix.append((r, c))
        out.append(pix)
    return out


_SLICES = [_diag_slices(0), _diag_slices(1)]


def compute_express(block, threshold):
    ex = extreme(block, threshold)
    if ex.sum() < int(BLOCK * BLOCK * 0.125):
        return False

    for orientation in range(2):
        wins = 0
        losses = 0
        for pix in _SLICES[orientation]:
            win = sum(1 for (r, c) in pix if ex[r, c])
            loss = len(pix) - win
            if wins < ROUNDS:
                wins = wins + 1 if win >= loss else 0
            if losses < ROUNDS:
                losses = losses + 1 if loss > win else 0
        if wins >= ROUNDS and losses >= ROUNDS:
            return True
    return False
