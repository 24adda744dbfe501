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
    """Immutable device view of the local map + the aligned host objects.

    The device image is ONE fused (P, 12) f32 upload (one RPC per republish
    on remote TPUs): cols 0:10 = pack [pos(3) normal(3) mind maxd valid ref],
    col 10 = track ids in ROW order (i32 bits; invalid rows = int32 max),
    col 11 = spare. The sorted-id view + permutation that track matching
    needs are computed IN-PROGRAM (ops/frame_step.prep_snapshot) — keeping
    the upload in row order lets the windowed drive patch rows on device
    (deferred-mapper triangulations/BA moves) and re-sort without a host
    round trip.

    Host-side stat accumulators: the per-frame IncreaseVisible/IncreaseFound
    bookkeeping (Tracking.cc:913-929, 1143-1147) is accumulated VECTORIZED
    into per-row arrays and flushed into the MapPoint objects once per
    keyframe (before MapPointCulling reads found_ratio) — per-frame Python
    attribute loops over hundreds of objects dominate replay cost on a
    single-core host."""

    __slots__ = (
        "fused", "mps", "version", "obs_pos", "vis_acc", "found_acc", "tids",
        "_tid_order",
    )

    def __init__(self, fused, mps=None, version=0, obs_pos=None, tids=None):
        self.fused = fused  # (P, 12) single-upload image; split INSIDE jit
        self.mps = mps  # row -> MapPoint (host)
        self.version = version
        n = len(mps) if mps is not None else 0
        # n_obs() > 0 at build time (points become bad/gain obs only at
        # mapper commits, which bump the change index and force a rebuild).
        self.obs_pos = (
            obs_pos if obs_pos is not None else np.zeros(n, bool)
        )
        self.vis_acc = np.zeros(n, np.int64)
        self.found_acc = np.zeros(n, np.int64)
        # Host copy of the per-row track ids (row order): the windowed drive
        # maps deferred-BA points -> snapshot rows for the device patch.
        self.tids = tids if tids is not None else np.zeros(n, np.int64)
        self._tid_order = None  # (argsort, sorted tids) built on first use

    def tid_order(self):
        """Cached stable argsort of the row-order track ids (the patch-meta
        builder needs it once per DISPATCH; sorting 4k ids every window
        showed up in the dispatch profile)."""
        if self._tid_order is None:
            order = np.argsort(self.tids, kind="stable")
            self._tid_order = (order, self.tids[order])
        return self._tid_order

    def flush_stats(self):
        """Apply accumulated visible/found counts to the MapPoint objects.
        Idempotent (accumulators zero after flush); call before any
        found_ratio consumer (MapPointCulling) runs."""
        if self.mps is None:
            return
        vis_rows = np.flatnonzero(self.vis_acc)
        for j in vis_rows:
            mp = self.mps[j]
            if mp is not None and not mp.bad:  # None: device-patched row the
                mp.n_visible += int(self.vis_acc[j])  # host gate rejected
        found_rows = np.flatnonzero(self.found_acc)
        for j in found_rows:
            mp = self.mps[j]
            if mp is not None and not mp.bad:
                mp.n_found += int(self.found_acc[j])
        self.vis_acc[:] = 0
        self.found_acc[:] = 0


def build_snapshot(m, ref_kf, cap=SNAP_CAP, max_kfs=80, reserve=0):
    """Flatten ref_kf's covisible neighborhood into a device snapshot.

    reserve leaves that many trailing rows empty for the windowed drive's
    device-side patch (deferred-mapper triangulations land at rows
    [len(mps), len(mps)+reserve) before the in-program re-sort)."""
    kfs = [ref_kf] + ref_kf.best_covisible(m, max_kfs)
    limit = cap - reserve
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
            if len(mps) >= limit:
                break
        if len(mps) >= limit:
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

    fused = np.zeros((cap, 12), np.float32)
    fused[:, 0:10] = pack
    fused[:, 10] = tid.view(np.float32)  # i32 bits, ROW order
    obs_pos = np.fromiter((len(mp.obs) > 0 for mp in mps), bool, n)
    return MapSnapshot(
        jnp.asarray(fused),
        mps=mps,
        version=m.change_index,
        obs_pos=obs_pos,
        tids=tid[:n].astype(np.int64),
    )
