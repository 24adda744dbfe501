"""256-bit binary descriptors packed as (..., 8) uint32, with VPU Hamming.

TPU-native equivalent of the reference's std::bitset<256> descriptors and
XOR-popcount distance (/root/reference/include/EXPRESS.h:90-115). Bit i of a
descriptor lives at bit (i % 32) of word (i // 32); bit i corresponds to pixel
(row=i//16, col=i%16) of a 16x16 macroblock.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DESC_WORDS = 8  # 256 bits / 32


def pack_bits(bits):
    """(..., 256) bool/int -> (..., 8) uint32."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (DESC_WORDS, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(desc):
    """(..., 8) uint32 -> (..., 256) bool."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts) & jnp.uint32(1)
    return bits.reshape(desc.shape[:-1] + (256,)).astype(jnp.bool_)


def popcount(desc):
    """Number of set bits per descriptor: (..., 8) u32 -> (...,) int32."""
    return jnp.sum(jax.lax.population_count(desc), axis=-1).astype(jnp.int32)


def hamming(d1, d2):
    """Hamming distance between packed descriptors (broadcasting): -> int32."""
    return jnp.sum(jax.lax.population_count(d1 ^ d2), axis=-1).astype(jnp.int32)
