"""Fixed-capacity track state (SoA pytree) — device-side feature tracks.

The reference's per-frame std::vector<VideoFeature> + trackId->index map
(/root/reference/include/Frame.h:79-107, 322-324) becomes a padded
structure-of-arrays pytree: every jitted program sees static shapes; validity
is a mask. trackId remains the global join key for all matching.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

MAX_TRACKS = 2048  # > 39*29 = 1131 dense-grid blocks at 640x480


@struct.dataclass
class TrackState:
    """One frame's feature tracks.

    pt       : (N, 2) f32 pixel positions (x, y).
    track_id : (N,) i32 global persistent track ids (-1 when invalid).
    age      : (N,) i32 frames tracked so far.
    desc     : (N, 8) u32 packed 256-bit EXPRESS descriptors.
    mb_wh    : (N, 2) f32 macroblock size (usually 16x16).
    coverage : (N,) bool — feature created by the low-coverage fallback; it is
               LK-tracked instead of MV-propagated (MOVExtractor.cc:258-261).
    valid    : (N,) bool.
    next_id  : () i32 — the extractor's monotonically increasing id counter
               (MOVExtractor.h mCurrentId).
    """

    pt: jnp.ndarray
    track_id: jnp.ndarray
    age: jnp.ndarray
    desc: jnp.ndarray
    mb_wh: jnp.ndarray
    coverage: jnp.ndarray
    valid: jnp.ndarray
    next_id: jnp.ndarray

    @property
    def capacity(self):
        return self.pt.shape[0]

    @property
    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def rebuild(packed, desc, next_id):
        """Rebuild a TrackState ON DEVICE from a fused-program packed export
        (ops/frame_step bit-packed words: pt(2xi16) | tid bits | meta) + the
        device-resident descriptor row (window desc_w side channel). Used to
        rewind to a mid-window frame — no host round trip (mb_wh is not
        exported; the 16x16 default is restored; pt carries the wire's
        1/32-px quantization)."""
        return _rebuild_state(packed, desc, jnp.asarray(next_id, jnp.int32))

    @staticmethod
    def empty(capacity=MAX_TRACKS, next_id=0):
        return TrackState(
            pt=jnp.zeros((capacity, 2), jnp.float32),
            track_id=jnp.full((capacity,), -1, jnp.int32),
            age=jnp.zeros((capacity,), jnp.int32),
            desc=jnp.zeros((capacity, 8), jnp.uint32),
            mb_wh=jnp.full((capacity, 2), 16.0, jnp.float32),
            coverage=jnp.zeros((capacity,), jnp.bool_),
            valid=jnp.zeros((capacity,), jnp.bool_),
            next_id=jnp.asarray(next_id, jnp.int32),
        )

    def to_numpy(self):
        """Host view with invalid entries dropped (for orchestration/tests).

        One device_get for the whole pytree — per-array pulls cost a full
        host<->device round trip each (30+ ms over a tunneled TPU)."""
        h = jax.device_get(self)
        v = np.asarray(h.valid)
        return {
            "pt": np.asarray(h.pt)[v],
            "track_id": np.asarray(h.track_id)[v],
            "age": np.asarray(h.age)[v],
            "desc": np.asarray(h.desc)[v],
            "coverage": np.asarray(h.coverage)[v],
            "next_id": int(h.next_id),
            "rows": np.flatnonzero(v),  # compacted slot -> capacity row
        }


@jax.jit
def _rebuild_state(packed, desc, next_id):
    from ..ops.frame_step import unpack_pt_dev

    meta = packed[:, 2]
    flags = (meta >> 25) & 0xF
    valid = (flags & 4) != 0
    tid = packed[:, 1]
    N = packed.shape[0]
    return TrackState(
        pt=unpack_pt_dev(packed[:, 0]),
        track_id=jnp.where(valid, tid, -1),
        age=meta & 0xFFF,
        desc=desc,
        mb_wh=jnp.full((N, 2), 16.0, jnp.float32),
        coverage=(flags & 8) != 0,
        valid=valid,
        next_id=next_id,
    )
