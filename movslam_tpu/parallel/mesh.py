"""Device-mesh helpers for multi-chip scaling.

The reference is a single-process 3-thread system (SURVEY.md §2.7); the
TPU-native scale-out axes are:
  - "data": embarrassingly parallel streams/runs (multi-stream tracking,
    evaluation fan-out),
  - observation/point sharding inside bundle adjustment (sharded_ba).
Collectives ride ICI via shard_map + psum.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_leading(mesh, tree, axis="data"):
    """Place every array in the pytree with its leading dim sharded."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh, tree):
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)
