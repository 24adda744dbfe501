"""Device-resident map snapshots for the fused frame step.

The mutex-guarded shared map of the reference (Map.h:137) becomes a
versioned, immutable snapshot: once per keyframe the host flattens the local
neighborhood (the covisibility set TrackLocalMap would walk,
Tracking.cc:1200-1339) into sorted-id arrays and uploads them once; every
frame then runs entirely on device against the snapshot (SURVEY.md §2.7's
"functional map state" design).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.frame_step import SNAP_CAP

I32MAX = np.iinfo(np.int32).max


class MapSnapshot:
    """Immutable device view of the local map + the aligned host objects."""

    __slots__ = ("tid_sorted", "perm", "pack", "mps", "version")

    def __init__(self, tid_sorted, perm, pack, *_unused, mps=None, version=0):
        self.tid_sorted = tid_sorted
        self.perm = perm
        self.pack = pack  # (P, 10): pos(3) normal(3) mind maxd valid ref
        self.mps = mps  # row -> MapPoint (host)
        self.version = version


def build_snapshot(m, ref_kf, cap=SNAP_CAP, max_kfs=80):
    """Flatten ref_kf's covisible neighborhood into a device snapshot."""
    kfs = [ref_kf] + ref_kf.best_covisible(m, max_kfs)
    seen = set()
    mps = []
    for kf in kfs:
        mids = kf.mp_ids[kf.mp_ids >= 0]
        for mid in mids:
            mid = int(mid)
            if mid in seen:
                continue
            seen.add(mid)
            mp = m.mappoints.get(mid)
            if mp is not None and not mp.bad:
                mps.append(mp)
            if len(mps) >= cap:
                break
        if len(mps) >= cap:
            break

    n = len(mps)
    tid = np.full(cap, I32MAX, np.int32)
    # One packed f32 upload: pos(3) normal(3) mind maxd valid ref_mask.
    pack = np.zeros((cap, 10), np.float32)
    pack[:, 7] = np.inf  # maxd default
    ref_ids = set(int(x) for x in ref_kf.mp_ids[ref_kf.mp_ids >= 0])
    if n:
        tid[:n] = np.fromiter((mp.track_id for mp in mps), np.int64, n)
        pack[:n, 0:3] = np.stack([mp.pos for mp in mps])
        pack[:n, 3:6] = np.stack([mp.normal for mp in mps])
        pack[:n, 6] = np.fromiter((mp.min_dist for mp in mps), float, n)
        pack[:n, 7] = np.fromiter((mp.max_dist for mp in mps), float, n)
        pack[:n, 8] = 1.0
        pack[:n, 9] = np.fromiter(
            (1.0 if mp.id in ref_ids else 0.0 for mp in mps), float, n
        )

    # Stable sort: searchsorted returns the LEFTMOST equal entry, which by
    # stability is the first-inserted duplicate (map::insert first-wins).
    order = np.argsort(tid, kind="stable")
    tid_sorted = tid[order]

    return MapSnapshot(
        jnp.asarray(tid_sorted),
        jnp.asarray(order.astype(np.int32)),
        jnp.asarray(pack),
        mps=mps,
        version=m.change_index,
    )
