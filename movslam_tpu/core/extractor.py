"""MOVExtractor — feature tracking from motion vectors, batched on device.

Orchestrates the jitted programs that replace the reference's per-feature
CPU loops (/root/reference/src/MOVExtractor.cc:63-455):

  P-frame  : MV propagation + coverage-LK + seed + low-coverage fallback,
             all in ONE jitted program (`_p_frame_step`).
  I-frame  : LK carry-over of all live tracks across the GOP boundary
             (MOVExtractor.cc:81-120) or dense-grid cold start (:123-157).
  reloc    : LK from the last keyframe's image against projected map points
             (MOVExtractor.cc:161-243), merged ahead of propagation.

Every program has static shapes (capacity padding + masks); tracks are
identified by global track ids, ages and 256-bit descriptors ride along as
SoA arrays (TrackState).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io.mvimage import FrameType, MotionVectorImage
from ..ops import express
from ..ops.bitdesc import hamming
from ..ops.lk import lk_track
from ..ops.mvselect import point_covered
from ..ops.propagate import MIN_SEED_COUNT, priority_rank, propagate_mv_tracks, seed_new_tracks
from .trackstate import MAX_TRACKS, TrackState

MAX_COV = 512  # capacity for coverage-flagged (LK) tracks per frame
BIG = jnp.iinfo(jnp.int32).max


def _compact(segments, capacity, next_id):
    """Merge candidate segments into a TrackState of fixed capacity.

    segments: list of dicts with keys pt, track_id, age, desc, wh, coverage,
    accept, order (order = within-segment emission order). Earlier segments
    have priority; duplicate track ids keep the earliest occurrence (matching
    std::map::insert first-wins in the reference's mvVFMap,
    MOVExtractor.cc:117).
    """
    cat = lambda k: jnp.concatenate([s[k] for s in segments], axis=0)
    pt = cat("pt")
    tid = cat("track_id")
    age = cat("age")
    desc = cat("desc")
    wh = cat("wh")
    cov = cat("coverage")
    accept = cat("accept")

    offsets = []
    off = 0
    for s in segments:
        offsets.append(off)
        off += int(s["accept"].shape[0])
    order = jnp.concatenate(
        [s["order"] + o for s, o in zip(segments, offsets)], axis=0
    ).astype(jnp.int32)
    order = jnp.where(accept, order, BIG)

    # Keep-first dedup on track id among accepted entries.
    tid_key = jnp.where(accept, tid, jnp.iinfo(jnp.int32).max)
    perm = jnp.lexsort((order, tid_key))
    tid_sorted = tid_key[perm]
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), tid_sorted[1:] != tid_sorted[:-1]]
    )
    keep = jnp.zeros_like(accept).at[perm].set(first) & accept

    sortkey = jnp.where(keep, order, BIG)
    take = jnp.argsort(sortkey)[:capacity]
    valid = jnp.take(keep, take)

    return TrackState(
        pt=pt[take],
        track_id=jnp.where(valid, tid[take], -1),
        age=age[take],
        desc=desc[take],
        mb_wh=wh[take],
        coverage=cov[take] & valid,
        valid=valid,
        next_id=next_id,
    )


def _segment_from_state(pt, tid, age, desc, wh, cov, accept, order):
    return {
        "pt": pt,
        "track_id": tid,
        "age": age,
        "desc": desc,
        "wh": wh,
        "coverage": cov,
        "accept": accept,
        "order": order,
    }


@functools.partial(jax.jit, static_argnames=("capacity", "max_cov"))
def _p_frame_step_packed(
    img,
    prev_img,
    prev: TrackState,
    mv_pack,
    kps_pack,
    coverage_area,
    threshold,
    coverage_threshold,
    capacity=MAX_TRACKS,
    max_cov=MAX_COV,
):
    """Packed-transfer wrapper: unpacks the single-upload MV/KP arrays
    (io.mvimage.MotionVectorImage.packed) inside the program."""
    return _p_frame_body(
        img,
        prev_img,
        prev,
        mv_pack[:, 0:2],
        mv_pack[:, 2:6],
        mv_pack[:, 6].astype(jnp.int32),
        mv_pack[:, 7] > 0,
        kps_pack[:, 0:4],
        kps_pack[:, 4] > 0,
        coverage_area,
        threshold,
        coverage_threshold,
        capacity,
        max_cov,
    )


@functools.partial(jax.jit, static_argnames=("capacity", "max_cov"))
def _p_frame_step(
    img,
    prev_img,
    prev: TrackState,
    mv_delta,
    mv_rect,
    mv_dindx,
    mv_valid,
    kps_rect,
    kps_valid,
    coverage_area,
    threshold,
    coverage_threshold,
    capacity=MAX_TRACKS,
    max_cov=MAX_COV,
):
    return _p_frame_body(
        img, prev_img, prev, mv_delta, mv_rect, mv_dindx, mv_valid,
        kps_rect, kps_valid, coverage_area, threshold, coverage_threshold,
        capacity, max_cov,
    )


def _p_frame_body(
    img,
    prev_img,
    prev: TrackState,
    mv_delta,
    mv_rect,
    mv_dindx,
    mv_valid,
    kps_rect,
    kps_valid,
    coverage_area,
    threshold,
    coverage_threshold,
    capacity,
    max_cov,
):
    H, W = img.shape
    N = prev.capacity

    # --- 1. MV propagation of non-coverage tracks -------------------------
    prop = propagate_mv_tracks(
        img,
        prev.pt,
        prev.valid,
        prev.coverage,
        prev.age,
        prev.desc,
        prev.mb_wh,
        mv_delta,
        mv_rect,
        mv_dindx,
        mv_valid,
        kps_rect.shape[0],
        threshold,
    )
    rank = priority_rank(prev.valid, prev.age, prev.desc)
    seg_prop = _segment_from_state(
        prop["new_pt"],
        prev.track_id,
        prev.age + 1,
        prop["new_desc"],
        prev.mb_wh,
        jnp.zeros((N,), jnp.bool_),
        prop["accepted"],
        rank,
    )

    # --- 2. coverage-flagged tracks: pyramidal LK -------------------------
    is_cov = prev.valid & prev.coverage
    cov_rank = jnp.cumsum(is_cov.astype(jnp.int32)) - 1
    slot_ok = is_cov & (cov_rank < max_cov)
    slot_idx = jnp.where(slot_ok, cov_rank, max_cov - 1)
    gather_idx = jnp.full((max_cov,), 0, jnp.int32).at[slot_idx].max(
        jnp.where(slot_ok, jnp.arange(N, dtype=jnp.int32), 0)
    )
    slot_used = jnp.zeros((max_cov,), jnp.bool_).at[slot_idx].max(slot_ok)

    cov_pts = prev.pt[gather_idx]
    # lax.cond: the (expensive) LK branch only executes when coverage tracks
    # exist — the common steady-state frame skips it entirely.
    lk_pts, lk_status = jax.lax.cond(
        jnp.any(slot_used),
        lambda: lk_track(prev_img, img, cov_pts, slot_used),
        lambda: (cov_pts, jnp.zeros((max_cov,), jnp.bool_)),
    )
    seg_cov = _segment_from_state(
        lk_pts,
        prev.track_id[gather_idx],
        prev.age[gather_idx] + 1,
        prev.desc[gather_idx],
        prev.mb_wh[gather_idx],
        jnp.ones((max_cov,), jnp.bool_),
        slot_used & lk_status,
        jnp.arange(max_cov, dtype=jnp.int32),
    )

    # --- 3. new-track seeds from unclaimed MV destination blocks ----------
    seed_pt, seed_desc, seed_accept, seed_order = seed_new_tracks(
        img, kps_rect, kps_valid, prop["kp_claimed"], threshold, W, H
    )
    n_seeds = jnp.sum(seed_accept.astype(jnp.int32))
    seed_ids = prev.next_id + 1 + seed_order
    K = kps_rect.shape[0]
    seg_seed = _segment_from_state(
        seed_pt,
        jnp.where(seed_accept, seed_ids, -1),
        jnp.zeros((K,), jnp.int32),
        seed_desc,
        kps_rect[:, 2:4],
        jnp.zeros((K,), jnp.bool_),
        seed_accept,
        jnp.arange(K, dtype=jnp.int32),
    )

    # --- 4. low-coverage fallback: dense grid, MV-free areas --------------
    fallback_on = (coverage_area < coverage_threshold) | (n_seeds < MIN_SEED_COUNT)
    g_centers, g_pass, g_desc = express.dense_grid_detect(img, threshold)
    g_covered = point_covered(g_centers, mv_rect, mv_valid)
    G = g_centers.shape[0]
    fb_accept = fallback_on & g_pass & ~g_covered
    fb_order = jnp.cumsum(fb_accept.astype(jnp.int32)) - 1
    fb_ids = prev.next_id + n_seeds + 1 + fb_order
    seg_fb = _segment_from_state(
        g_centers,
        jnp.where(fb_accept, fb_ids, -1),
        jnp.zeros((G,), jnp.int32),
        g_desc,
        jnp.full((G, 2), float(express.BLOCK), jnp.float32),
        jnp.ones((G,), jnp.bool_),
        fb_accept,
        fb_order,
    )
    n_fb = jnp.sum(fb_accept.astype(jnp.int32))

    next_id = prev.next_id + n_seeds + n_fb
    return _compact([seg_prop, seg_cov, seg_seed, seg_fb], capacity, next_id)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _i_frame_carryover(img, prev_img, prev: TrackState, capacity=MAX_TRACKS):
    """LK carry-over of all live tracks across a GOP boundary
    (MOVExtractor.cc:81-120). Coverage flags reset; descriptors retained."""
    new_pts, status = lk_track(prev_img, img, prev.pt, prev.valid)
    N = prev.capacity
    seg = _segment_from_state(
        new_pts,
        prev.track_id,
        prev.age + 1,
        prev.desc,
        prev.mb_wh,
        jnp.zeros((N,), jnp.bool_),
        prev.valid & status,
        jnp.arange(N, dtype=jnp.int32),
    )
    return _compact([seg], capacity, prev.next_id)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _i_frame_coldstart(img, threshold, next_id, capacity=MAX_TRACKS):
    """Dense-grid EXPRESS detection with fresh ids (MOVExtractor.cc:123-157)."""
    centers, passed, desc = express.dense_grid_detect(img, threshold)
    G = centers.shape[0]
    order = jnp.cumsum(passed.astype(jnp.int32)) - 1
    ids = next_id + 1 + order
    seg = _segment_from_state(
        centers,
        jnp.where(passed, ids, -1),
        jnp.zeros((G,), jnp.int32),
        desc,
        jnp.full((G, 2), float(express.BLOCK), jnp.float32),
        jnp.zeros((G,), jnp.bool_),
        passed,
        order,
    )
    n_new = jnp.sum(passed.astype(jnp.int32))
    return _compact([seg], capacity, next_id + n_new)


@functools.partial(jax.jit, static_argnames=())
def _relocalize_lk(kf_img, img, proj_pts, proj_valid, track_ids, reloc_dist, threshold):
    """LK from the last KF image toward projected map points
    (MOVExtractor.cc:161-243). Returns a merge-ready segment."""
    H, W = img.shape
    new_pts, status = lk_track(kf_img, img, proj_pts, proj_valid)
    dist = jnp.linalg.norm(new_pts - proj_pts, axis=-1)
    diag = jnp.sqrt(float(H * H + W * W))
    ok = status & (dist < reloc_dist * diag)

    tl = new_pts.astype(jnp.int32) - express.BLOCK // 2
    inb = (
        (tl[:, 0] >= 0)
        & (tl[:, 1] >= 0)
        & (tl[:, 0] + express.BLOCK < W)
        & (tl[:, 1] + express.BLOCK < H)
    )
    blocks = express.gather_blocks(img.astype(jnp.float32), tl)
    desc = express.compute_descriptor(blocks, threshold)

    R = proj_pts.shape[0]
    return _segment_from_state(
        new_pts,
        track_ids,
        jnp.zeros((R,), jnp.int32),
        desc,
        jnp.full((R, 2), float(express.BLOCK), jnp.float32),
        jnp.zeros((R,), jnp.bool_),
        ok & inb,
        jnp.arange(R, dtype=jnp.int32),
    )


class MOVExtractor:
    """Host-side facade choosing among the jitted extraction programs.

    Mirrors the constructor parameters of the reference extractor
    (MOVExtractor.h: threshold, coverageThreshold, relocalizationDistance).
    """

    def __init__(
        self,
        threshold=25,
        coverage_threshold=0.2,
        relocalization_distance=0.05,
        capacity=MAX_TRACKS,
    ):
        self.threshold = float(threshold)
        self.coverage_threshold = float(coverage_threshold)
        self.relocalization_distance = float(relocalization_distance)
        self.capacity = capacity
        # Persistent id counter (mCurrentId): survives map resets, which clear
        # the previous frame but not the extractor (MOVExtractor.h:38).
        # Kept as a device scalar between frames to avoid blocking syncs.
        self._next_id_dev = None

    @property
    def next_id(self):
        return 0 if self._next_id_dev is None else int(self._next_id_dev)

    def extract(self, smv: MotionVectorImage, prev_state, prev_img, reloc=None, img_dev=None):
        """One frame of feature extraction.

        smv: MotionVectorImage (host). prev_state: TrackState or None.
        prev_img: previous gray image (device or numpy) or None.
        reloc: optional dict(kf_img, proj_pts, proj_valid, track_ids) for the
        lost-track LK recovery path.

        Returns the new TrackState.
        """
        img = img_dev if img_dev is not None else jnp.asarray(smv.im_gray)

        if smv.ft == FrameType.I_FRAME or prev_state is None:
            if prev_state is not None and int(jnp.sum(prev_state.valid)) > 0:
                out = _i_frame_carryover(
                    img, jnp.asarray(prev_img), prev_state, capacity=self.capacity
                )
            else:
                if prev_state is not None:
                    next_id = prev_state.next_id
                elif self._next_id_dev is not None:
                    next_id = self._next_id_dev
                else:
                    next_id = jnp.asarray(0, jnp.int32)
                out = _i_frame_coldstart(
                    img, self.threshold, next_id, capacity=self.capacity
                )
            self._next_id_dev = out.next_id  # no blocking sync per frame
            return out

        mv_pack, kps_pack = smv.packed()
        state = _p_frame_step_packed(
            img,
            jnp.asarray(prev_img),
            prev_state,
            jnp.asarray(mv_pack),
            jnp.asarray(kps_pack),
            jnp.asarray(smv.coverage_area, jnp.float32),
            self.threshold,
            self.coverage_threshold,
            capacity=self.capacity,
        )

        if reloc is not None:
            seg_reloc = _relocalize_lk(
                jnp.asarray(reloc["kf_img"]),
                img,
                jnp.asarray(reloc["proj_pts"]),
                jnp.asarray(reloc["proj_valid"]),
                jnp.asarray(reloc["track_ids"]),
                self.relocalization_distance,
                self.threshold,
            )
            seg_main = _segment_from_state(
                state.pt,
                state.track_id,
                state.age,
                state.desc,
                state.mb_wh,
                state.coverage,
                state.valid,
                jnp.arange(state.capacity, dtype=jnp.int32),
            )
            state = _merge_reloc(seg_reloc, seg_main, state.next_id, self.capacity)
        self._next_id_dev = state.next_id  # no blocking sync per frame
        return state


@functools.partial(jax.jit, static_argnames=("capacity",))
def _merge_reloc(seg_reloc, seg_main, next_id, capacity):
    return _compact([seg_reloc, seg_main], capacity, next_id)
