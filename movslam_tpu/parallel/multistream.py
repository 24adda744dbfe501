"""Data-parallel multi-stream tracking: one SLAM stream per device.

The reference processes a single video on one CPU; on a TPU pod the natural
scale-out for evaluation sweeps and multi-camera rigs is stream-parallelism:
the per-frame extraction step is vmapped over a batch of streams whose
leading axis is sharded over the mesh's "data" axis — XLA partitions the
whole program with zero cross-device traffic (embarrassingly parallel,
SURVEY.md §2.7 row "TCP ingest" / §5 long-context analogue).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.trackstate import TrackState
from ..ops.propagate import propagate_mv_tracks


def make_multistream_propagate(mesh: Mesh, axis="data"):
    """Batched MV track propagation over S streams, sharded over devices.

    Returns a jitted fn(imgs (S,H,W), state pytree with leading S, mv arrays
    (S,M,...), kps capacity) -> per-stream propagation results."""

    def single(img, pt, valid, coverage, age, desc, wh, mv_delta, mv_rect,
               mv_dindx, mv_valid, threshold):
        return propagate_mv_tracks(
            img, pt, valid, coverage, age, desc, wh,
            mv_delta, mv_rect, mv_dindx, mv_valid,
            n_kps_capacity=mv_dindx.shape[0], threshold=threshold,
        )

    batched = jax.vmap(single, in_axes=(0,) * 11 + (None,))

    def sharded(imgs, pt, valid, coverage, age, desc, wh,
                mv_delta, mv_rect, mv_dindx, mv_valid, threshold):
        spec = NamedSharding(mesh, P(axis))
        args = [imgs, pt, valid, coverage, age, desc, wh,
                mv_delta, mv_rect, mv_dindx, mv_valid]
        args = [jax.lax.with_sharding_constraint(a, spec) for a in args]
        return batched(*args, threshold)

    return jax.jit(sharded)
