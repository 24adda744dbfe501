"""Golden tests: batched JAX EXPRESS vs scalar NumPy transcription."""
import pytest
import numpy as np
import jax.numpy as jnp

from movslam_tpu.ops import express, bitdesc
from tests.golden import express_ref

pytestmark = pytest.mark.smoke


def _random_blocks(rng, n):
    """Mix of flat, noisy, and structured blocks to hit both branches."""
    blocks = []
    for i in range(n):
        kind = i % 4
        if kind == 0:  # flat
            b = np.full((16, 16), rng.integers(0, 256), np.uint8)
        elif kind == 1:  # uniform noise
            b = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        elif kind == 2:  # corner structure: bright quadrant
            b = np.full((16, 16), 40, np.uint8)
            b[:8, :8] = 220
        else:  # gradient + noise
            g = np.linspace(0, 255, 16)[None, :] * np.ones((16, 1))
            b = np.clip(g + rng.normal(0, 20, (16, 16)), 0, 255).astype(np.uint8)
        blocks.append(b)
    return np.stack(blocks)


def test_descriptor_matches_golden(rng):
    blocks = _random_blocks(rng, 64)
    thr = 25
    desc = np.asarray(express.compute_descriptor(jnp.asarray(blocks), thr))
    bits = np.asarray(bitdesc.unpack_bits(jnp.asarray(desc)))
    for i in range(len(blocks)):
        ref_bits = express_ref.descriptor_bits(blocks[i], thr)
        np.testing.assert_array_equal(bits[i], ref_bits, err_msg=f"block {i}")


def test_detector_matches_golden(rng):
    blocks = _random_blocks(rng, 128)
    for thr in (10, 25, 40):
        got = np.asarray(express.compute_express(jnp.asarray(blocks), thr))
        want = np.array(
            [express_ref.compute_express(b, thr) for b in blocks], dtype=bool
        )
        np.testing.assert_array_equal(got, want, err_msg=f"threshold {thr}")


def test_detector_fires_on_stripe_not_flat():
    # Background at the center intensity with a 6-column bright stripe:
    # diagonals crossing the stripe win, the rest lose -> both streaks exist.
    stripe = np.full((16, 16), 128, np.uint8)
    stripe[:, :6] = 255
    flat = np.full((16, 16), 128, np.uint8)
    assert express_ref.compute_express(stripe, 25)  # golden agrees
    got = np.asarray(
        express.compute_express(jnp.stack([jnp.asarray(stripe), jnp.asarray(flat)]), 25)
    )
    assert got[0] and not got[1]


def test_hamming_matches_golden(rng):
    blocks = _random_blocks(rng, 32)
    thr = 25
    desc = np.asarray(express.compute_descriptor(jnp.asarray(blocks), thr))
    d = np.asarray(bitdesc.hamming(jnp.asarray(desc[:16]), jnp.asarray(desc[16:])))
    for i in range(16):
        b1 = express_ref.descriptor_bits(blocks[i], thr)
        b2 = express_ref.descriptor_bits(blocks[16 + i], thr)
        assert d[i] == express_ref.hamming(b1, b2)


def test_pack_unpack_roundtrip(rng):
    bits = rng.integers(0, 2, (10, 256)).astype(bool)
    packed = bitdesc.pack_bits(jnp.asarray(bits))
    np.testing.assert_array_equal(np.asarray(bitdesc.unpack_bits(packed)), bits)
    np.testing.assert_array_equal(
        np.asarray(bitdesc.popcount(packed)), bits.sum(-1)
    )


def test_dense_grid_positions():
    img = jnp.zeros((480, 640), jnp.uint8)
    centers, passed, desc = express.dense_grid_detect(img, 25)
    c = np.asarray(centers)
    # Reference loop: y,x from 8 step 16 while < dim-8 and tl+16 < dim
    xs = [x for x in range(8, 640 - 8, 16) if (x - 8 + 16) < 640]
    ys = [y for y in range(8, 480 - 8, 16) if (y - 8 + 16) < 480]
    assert c.shape == (len(xs) * len(ys), 2)
    assert c[:, 0].min() == 8 and c[:, 1].min() == 8
    assert not np.asarray(passed).any()  # flat image: nothing detected
