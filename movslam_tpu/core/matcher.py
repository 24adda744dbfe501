"""MOVMatcher: all matching is a track-id join.

Replaces /root/reference/include/MOVMatcher.h — since motion-vector chains
already carry persistent track ids, "matching" degenerates into id equality:
  - frame <-> local map points   (SearchByVideoFeature, :35-68)
  - keyframe <-> frame           (SearchByVideoFeature, :70-103)
  - init frame pair              (SearchForInitialization, :105-137)
  - keyframe <-> keyframe        (SearchForTriangulation, :139-168)
  - map-point fusion gates       (Fuse, :170-277)

Joins use numpy vectorized id matching instead of the reference's per-point
loops (or O(N^2) scans for triangulation).
"""
from __future__ import annotations

import numpy as np

from .map import SCALE_FACTOR, N_LEVELS


def match_ids(ids_a, ids_b):
    """Vectorized first-occurrence id join.

    Returns (idx_a, idx_b): positions such that ids_a[idx_a] == ids_b[idx_b],
    one match per unique id (first occurrence on both sides)."""
    ids_a = np.asarray(ids_a)
    ids_b = np.asarray(ids_b)
    common, ia, ib = np.intersect1d(ids_a, ids_b, return_indices=True)
    keep = common >= 0
    return ia[keep], ib[keep]


def search_by_video_feature_kf(kf, frame, mp_map):
    """KF map-points -> frame slots by track id (MOVMatcher.h:70-103).

    Fills frame.mappoints; returns match count."""
    n = 0
    for slot, mid in enumerate(kf.mp_ids):
        if mid < 0:
            continue
        mp = mp_map.mappoints.get(int(mid))
        if mp is None or mp.bad:
            continue
        fslot = frame.slot_of_track(mp.track_id)
        if fslot >= 0:
            frame.mappoints[fslot] = mp
            n += 1
    return n


def search_by_video_feature_local(frame, local_mps, far_points, th_far):
    """Local map points -> frame slots (MOVMatcher.h:35-68).

    Only points flagged track_in_view by the frustum pass participate."""
    n = 0
    for mp in local_mps:
        if far_points and mp.track_depth > th_far:
            continue
        if mp.bad or not mp.track_in_view:
            continue
        fslot = frame.slot_of_track(mp.track_id)
        if fslot >= 0:
            frame.mappoints[fslot] = mp
            n += 1
    return n


def search_for_initialization(f1, f2):
    """Id join between the two init frames (MOVMatcher.h:105-137).

    Returns matches12: slot in f1 -> slot in f2 (or -1)."""
    matches12 = np.full(f1.n, -1, np.int64)
    for j in range(f2.n):
        i = f1.slot_of_track(f2.track_ids[j])
        if i >= 0 and matches12[i] < 0:
            matches12[i] = j
    return matches12


def search_for_triangulation(kf1, kf2):
    """Unmatched-slot id join between two KFs (MOVMatcher.h:139-168).

    Returns (slots1, slots2) arrays of matched, map-point-free slots."""
    free1 = kf1.mp_ids < 0
    free2 = kf2.mp_ids < 0
    ids1 = np.where(free1, kf1.track_ids, -1)
    ids2 = np.where(free2, kf2.track_ids, -1)
    ia, ib = match_ids(ids1, ids2)
    return ia, ib


def fuse(kf, mappoints, mp_map, camera):
    """Project candidate map points into kf; merge duplicates by track id
    (MOVMatcher.h:170-277). Projection/distance/angle gates are vectorized;
    only survivors touch the graph. Returns number fused."""
    cand = [mp for mp in mappoints if mp is not None and not mp.bad and kf.id not in mp.obs]
    if not cand:
        return 0
    R, t = kf.pose()
    Ow = kf.center()

    pos = np.stack([mp.pos for mp in cand])
    pc = pos @ R.T + t
    z = pc[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = camera.fx * pc[:, 0] / z + camera.cx
        v = camera.fy * pc[:, 1] / z + camera.cy
    po = pos - Ow
    dist = np.linalg.norm(po, axis=1)
    normal = np.stack([mp.normal for mp in cand])
    mind = np.fromiter((mp.min_dist for mp in cand), float, len(cand))
    maxd = np.fromiter((mp.max_dist for mp in cand), float, len(cand))
    ok = (
        (z >= 0.0)
        & (u >= 0) & (u < camera.width)
        & (v >= 0) & (v < camera.height)
        & (dist >= mind) & (dist <= maxd)
        & (np.einsum("ij,ij->i", po, normal) >= 0.5 * dist)  # < 60 deg
    )
    if not ok.any():
        return 0

    kf_slots_by_track = {int(tid): s for s, tid in enumerate(kf.track_ids)}
    fused = 0
    for k in np.flatnonzero(ok):
        mp = cand[k]
        if mp.bad:
            continue
        slot = kf_slots_by_track.get(mp.track_id, -1)
        if slot < 0:
            continue
        existing_id = kf.mp_ids[slot]
        if existing_id >= 0:
            existing = mp_map.mappoints.get(int(existing_id))
            if existing is not None and not existing.bad and existing.id != mp.id:
                if existing.n_obs() > mp.n_obs():
                    mp.replace(existing, mp_map)
                else:
                    existing.replace(mp, mp_map)
        else:
            mp.add_observation(kf, slot)
            kf.add_mappoint(mp, slot)
        fused += 1
    return fused
