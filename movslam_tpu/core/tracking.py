"""Tracking: the per-frame front-end state machine.

Mirrors /root/reference/src/Tracking.cc:215-518 —
{NO_IMAGES_YET, NOT_INITIALIZED, OK, RECENTLY_LOST, LOST} with monocular
two-view initialization, reference-KF tracking, local-map tracking, keyframe
decisions and multi-map recovery. Pose estimation dispatches to the batched
device PnP (movslam_tpu.ops.pnp) instead of cv::solvePnPRansac
(Optimizer.cc:397-459); matching is a track-id join (core.matcher).
"""
from __future__ import annotations

import enum

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pnp import pnp_ransac, pnp_ransac_fused
from ..ops.twoview import reconstruct_two_views
from ..ops.ba import ba_solve, build_obs_by_point
from .frame import Frame
from .map import KeyFrame, MapPoint
from .matcher import (
    search_by_video_feature_kf,
    search_by_video_feature_local,
    search_for_initialization,
)


class State(enum.IntEnum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    RECENTLY_LOST = 3
    LOST = 4


class Tracking:
    def __init__(self, system, atlas, local_mapper, settings, extractor):
        self.system = system
        self.atlas = atlas
        self.mapper = local_mapper
        self.settings = settings
        self.extractor = extractor
        self.camera = settings.camera1

        self.state = State.NO_IMAGES_YET
        self.lost_count = 0
        self.tracked_frames = 0
        self.matches_inliers = 0
        self.last_ref_track_count = 0
        # Localization-only mode (System::ActivateLocalizationMode,
        # /root/reference/src/System.cc:171-234, System.h:118-121): track
        # against the frozen map — no keyframes, no map mutation, no
        # new-map-in-atlas recovery.
        self.only_tracking = False

        self.max_frames = int(settings.fps / 2)
        self.min_frames = 0

        self.current = None
        self.last_frame = None
        self.initial_frame = None
        self.ready_to_init = False
        self.init_matches = None

        self.reference_kf = None
        self.last_kf = None
        self.last_kf_frame_id = -1
        self.last_reloc_frame_id = -9999
        self.ts_lost = 0.0

        self.local_kfs = []
        self.local_mps = []

        self.velocity = None  # (R, t) of T_cur * T_last^-1

        # trajectory logs (Tracking.cc:486-505)
        self.rel_poses = []
        self.rel_refs = []
        self.rel_times = []
        self.rel_lost = []

        self._pnp_key = jax.random.PRNGKey(7)
        cam = settings.camera1
        self._intr = jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32)

        # REGISTER_TIMES-style per-stage durations (ms), always on
        # (the reference gates these behind a compile flag,
        # include/Tracking.h:165-178).
        self.timings = {
            "track_ref_kf": [], "track_local_map": [], "pose_opt": [],
            "new_kf": [],
        }

    # ------------------------------------------------------------------
    def grab_frame(self, frame):
        """Run Track() on a prepared Frame (Tracking::Track). Holds the map
        lock for the whole step like the reference (Tracking.cc:274)."""
        with self.mapper.map_lock:
            return self._grab_frame_locked(frame)

    def _grab_frame_locked(self, frame):
        self.current = frame
        m = self.atlas.current

        if self.state in (State.LOST, State.RECENTLY_LOST):
            self.lost_count += 1

        if self.state == State.NO_IMAGES_YET:
            self.state = State.NOT_INITIALIZED

        if self.state == State.NOT_INITIALIZED:
            if self.settings.sensor == 1:
                self._stereo_initialization()
            else:
                self._monocular_initialization()
            if self.state != State.OK:
                self.last_frame = self.current
                return
        else:
            ok = False
            if self.state == State.OK:
                self._check_replaced_in_last_frame()
                ok = self._track_reference_keyframe()
                if not ok:
                    if m.n_keyframes() > 10:
                        self.state = State.RECENTLY_LOST
                        self.ts_lost = self.current.timestamp
                    else:
                        self.state = State.LOST
            elif self.state == State.RECENTLY_LOST:
                ok = self._track_reference_keyframe()
                if not ok:
                    ok = self._relocalization()
                if self.current.timestamp - self.ts_lost > 1.0 and not ok:
                    self.state = State.LOST
                    ok = False
            if self.state == State.LOST:
                if self.only_tracking:
                    # Frozen map: never reset or spawn a new Atlas map —
                    # stay in RECENTLY_LOST retrying relocalization
                    # (reference localization mode keeps the tracker alive
                    # on the loaded map, System.cc:171-234).
                    self.state = State.RECENTLY_LOST
                    self.current.lost = True
                    self.last_frame = self.current
                    return
                if m.n_keyframes() < 10:
                    self.system.reset_active_map()
                else:
                    self._create_map_in_atlas()
                self.last_kf = None
                return

            if self.current.reference_kf is None:
                self.current.reference_kf = self.reference_kf

            if ok:
                ok = self._track_local_map()

            self._post_tracking_tail(ok, m)
            if self.state == State.LOST or self.current is None:
                return

        self._log_trajectory()

    def _post_tracking_tail(self, ok, m):
        """Shared tail of Track(): state update, velocity/motion model,
        temporal cleanup, keyframe decision, loss handling
        (Tracking.cc:395-484). Used by both the legacy and the fused path."""
        if ok:
            self.state = State.OK
        elif self.state == State.OK:
            self.state = State.RECENTLY_LOST
            self.ts_lost = self.current.timestamp

        if ok or self.state == State.RECENTLY_LOST:
            if (
                self.last_frame is not None
                and self.last_frame.pose_set
                and self.current.pose_set
            ):
                R_l, t_l = self.last_frame.R, self.last_frame.t
                R_c, t_c = self.current.R, self.current.t
                # velocity = T_c * T_l^-1
                Rv = R_c @ R_l.T
                tv = t_c - Rv @ t_l
                self.velocity = (Rv, tv)
            else:
                self.velocity = None

            # Clean unobserved VO matches (Tracking.cc:427-436). Lazy fused
            # frames folded the n_obs>0 gate into their match mask already.
            cur = self.current
            if cur._mappoints is not None:
                for i, mp in enumerate(cur._mappoints):
                    if mp is not None and mp.n_obs() < 1:
                        cur.outlier[i] = False
                        cur._mappoints[i] = None

            if not self.only_tracking and self._need_new_keyframe() and ok:
                self._create_new_keyframe()

            # Drop outliers so the next frame won't use them
            # (Tracking.cc:459-463).
            if cur._mappoints is not None:
                for i in range(cur.n):
                    if cur._mappoints[i] is not None and cur.outlier[i]:
                        cur._mappoints[i] = None
            elif cur._lazy_src is not None:
                mps_, midx_, mask_ = cur._lazy_src
                cur._lazy_src = (mps_, midx_, mask_ & ~cur.outlier)
                cur.outlier = np.zeros(cur.n, bool)

        if self.state == State.LOST:
            if self.only_tracking:
                self.state = State.RECENTLY_LOST
                self.current.lost = True
                self.last_frame = self.current
                return
            if m.n_keyframes() <= 10:
                self.system.reset_active_map()
                self.current = None
                return
            self._create_map_in_atlas()
            return

        if self.current.reference_kf is None:
            self.current.reference_kf = self.reference_kf
        self.last_frame = self.current

    def _log_trajectory(self):
        """Trajectory bookkeeping (Tracking.cc:486-505)."""
        if self.current is None:
            return
        if self.state in (State.OK, State.RECENTLY_LOST):
            if self.current.pose_set and self.current.reference_kf is not None:
                ref = self.current.reference_kf
                R_rel = self.current.R @ ref.R.T
                t_rel = self.current.t - R_rel @ ref.t
                self.rel_poses.append((R_rel, t_rel))
                self.rel_refs.append(ref)
                self.rel_times.append(self.current.timestamp)
                self.rel_lost.append(self.state == State.LOST)
            elif self.rel_poses:
                self.rel_poses.append(self.rel_poses[-1])
                self.rel_refs.append(self.rel_refs[-1])
                self.rel_times.append(self.rel_times[-1])
                self.rel_lost.append(self.state == State.LOST)

    # --- fused front end -----------------------------------------------------
    def track_fused(self, frame, out, snapshot):
        """Track() driven by the fused device program's result
        (ops/frame_step.tracked_frame_step): the reference-KF gate, the
        local-map solve, and the match/inlier masks were all computed in one
        dispatch; this applies the same state machine on the host.

        Only entered from the OK state (System falls back to the legacy path
        for init/loss states, where the reloc machinery lives)."""
        import time as _t
        _t0 = _t.perf_counter()
        try:
            return self._track_fused_inner(frame, out, snapshot)
        finally:
            self.timings["track_local_map"].append(1e3 * (_t.perf_counter() - _t0))

    def _track_fused_inner(self, frame, out, snapshot):
        with self.mapper.map_lock:
            self.current = frame
            m = self.atlas.current

            # Per-slot fused results already row-compacted by Frame.from_packed.
            midx = frame._fused_midx
            matched = frame._fused_matched
            inlier = frame._fused_inlier

            ok_ref = bool(out["ok"]) and int(out["n_ref_inliers"]) >= 10
            if not ok_ref:
                # TrackReferenceKeyFrame failed (Tracking.cc:325-337).
                if m.n_keyframes() > 10 or self.only_tracking:
                    self.state = State.RECENTLY_LOST
                    self.ts_lost = frame.timestamp
                else:
                    self.state = State.LOST
                if self.state == State.LOST:
                    if m.n_keyframes() < 10:
                        self.system.reset_active_map()
                    else:
                        self._create_map_in_atlas()
                    self.last_kf = None
                    return
                # RECENTLY_LOST: keep the last pose; legacy path takes over
                # next frame (reloc).
                frame.set_pose(*(self.last_frame.R, self.last_frame.t))
                frame.reference_kf = self.reference_kf
                self._post_tracking_tail(False, m)
                if self.state != State.LOST and self.current is not None:
                    self._log_trajectory()
                return

            frame.set_pose(
                np.asarray(out["R"], np.float64), np.asarray(out["t"], np.float64)
            )
            frame.reference_kf = self.reference_kf
            self.last_ref_track_count = int(out["n_ref_inliers"])

            # Associate map points + statistics (SearchLocalPoints +
            # TrackLocalMap bookkeeping, Tracking.cc:913-929). Visibility
            # counts every frustum-passing snapshot point (matched or not).
            # All bookkeeping is VECTORIZED into snapshot accumulators
            # (flushed per keyframe) and a lazy match mask on the frame —
            # per-frame Python object loops dominate replay cost on a
            # single-core host.
            mps = snapshot.mps
            P_used = len(mps)
            snapshot.vis_acc[out["snap_visible"][:P_used]] += 1
            midx_safe = np.where(matched, midx, 0).astype(np.int64)
            obs_row = snapshot.obs_pos[midx_safe] & matched
            snapshot.found_acc[midx_safe[matched & inlier]] += 1
            n_inl = int(np.count_nonzero(matched & inlier & obs_row))
            # Pre-keyframe association = matched points with observations
            # (the VO-match cleanup of Tracking.cc:427-436 folded in);
            # outliers drop after keyframe creation (_post_tracking_tail).
            frame.set_lazy_matches(mps, midx, obs_row)
            frame.outlier = matched & ~inlier
            self.matches_inliers = n_inl
            self.tracked_frames += 1

            ok = n_inl >= 30
            if frame.id < self.last_reloc_frame_id + self.max_frames and n_inl < 50:
                ok = False

            self._post_tracking_tail(ok, m)
            if self.state == State.LOST or self.current is None:
                return
        self._log_trajectory()

    # --- initialization ----------------------------------------------------
    def _monocular_initialization(self):
        """Tracking::MonocularInitialization (Tracking.cc:575-639)."""
        if not self.ready_to_init:
            if self.current.n > 100:
                self.initial_frame = self.current
                self.last_frame = self.current
                self.ready_to_init = True
            return

        if self.current.n <= 100:
            self.ready_to_init = False
            return

        matches12 = search_for_initialization(self.initial_frame, self.current)
        nmatches = int(np.sum(matches12 >= 0))
        if nmatches < 100:
            self.ready_to_init = False
            return

        # Batched two-view reconstruction on device.
        sel = np.flatnonzero(matches12 >= 0)
        cap = 1024
        uv1 = np.zeros((cap, 2), np.float32)
        uv2 = np.zeros((cap, 2), np.float32)
        valid = np.zeros(cap, bool)
        n = min(len(sel), cap)
        uv1[:n] = self.initial_frame.pts[sel[:n]]
        uv2[:n] = self.current.pts[matches12[sel[:n]]]
        valid[:n] = True

        cam = self.camera
        self._pnp_key, key = jax.random.split(self._pnp_key)
        res = reconstruct_two_views(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            cam.fx, cam.fy, cam.cx, cam.cy, key,
        )
        if not bool(res["ok"]):
            return

        tri = np.asarray(res["triangulated"])[:n]
        pts3d = np.asarray(res["points"])[:n]
        R21 = np.asarray(res["R21"], np.float64)
        t21 = np.asarray(res["t21"], np.float64)

        self._create_initial_map(sel[:n], matches12, tri, pts3d, R21, t21)

    def _create_initial_map(self, sel, matches12, tri, pts3d, R21, t21):
        """Tracking::CreateInitialMapMonocular (Tracking.cc:641-748)."""
        m = self.atlas.current
        self.initial_frame.set_pose(np.eye(3), np.zeros(3))
        self.current.set_pose(R21, t21)

        kf_ini = KeyFrame(self.initial_frame, m.id)
        kf_cur = KeyFrame(self.current, m.id)
        m.add_keyframe(kf_ini)
        m.add_keyframe(kf_cur)

        for k, i in enumerate(sel):
            if not tri[k]:
                continue
            j = int(matches12[i])
            mp = MapPoint(pts3d[k], kf_ini.id, int(self.current.track_ids[j]), m.id)
            mp.add_observation(kf_ini, int(i))
            mp.add_observation(kf_cur, j)
            kf_ini.add_mappoint(mp, int(i))
            kf_cur.add_mappoint(mp, j)
            m.add_mappoint(mp)
            mp.update_normal_and_depth(m)
            self.current.mappoints[j] = mp

        kf_ini.update_connections(m)
        kf_cur.update_connections(m)

        # Global BA on the 2-KF map (Optimizer::GlobalBundleAdjustemnt(20)).
        self._global_ba_two_kf(m, kf_ini, kf_cur)

        med = kf_ini.scene_median_depth(m)
        if med < 0 or kf_cur.n_tracked_points(m, 1) < 50:
            self.system.reset_active_map()
            return

        inv_med = 1.0 / med
        kf_cur.t = kf_cur.t * inv_med
        for mid in list(kf_ini.mp_ids):
            if mid >= 0:
                mp = m.mappoints.get(int(mid))
                if mp is not None:
                    mp.pos = mp.pos * inv_med
                    mp.update_normal_and_depth(m)

        self.mapper.insert_keyframe(kf_ini)
        self.mapper.insert_keyframe(kf_cur)
        self.mapper.spin()

        self.current.set_pose(kf_cur.R, kf_cur.t)
        self.last_kf_frame_id = self.current.id
        self.last_kf = kf_cur
        self.local_kfs = [kf_cur, kf_ini]
        self.local_mps = [mp for mp in m.mappoints.values() if not mp.bad]
        self.reference_kf = kf_cur
        self.current.reference_kf = kf_cur
        self.last_frame = self.current
        m.kf_origins.append(kf_ini)
        self.state = State.OK

    def _global_ba_two_kf(self, m, kf_ini, kf_cur):
        mps = [mp for mp in m.mappoints.values() if not mp.bad]
        if not mps:
            return
        P = 1024
        O = 2048
        kf_R = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
        kf_t = np.zeros((2, 3), np.float32)
        kfs = [kf_ini, kf_cur]
        for i, kf in enumerate(kfs):
            kf_R[i] = kf.R
            kf_t[i] = kf.t
        mp_pos = np.zeros((P, 3), np.float32)
        mp_valid = np.zeros(P, bool)
        obs_kf = np.zeros(O, np.int32)
        obs_mp = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_valid = np.zeros(O, bool)
        n_obs = 0
        mps = mps[:P]
        for j, mp in enumerate(mps):
            mp_pos[j] = mp.pos
            mp_valid[j] = True
            for i, kf in enumerate(kfs):
                slot = mp.obs.get(kf.id)
                if slot is not None and n_obs < O:
                    obs_kf[n_obs] = i
                    obs_mp[n_obs] = j
                    obs_uv[n_obs] = kf.pts[slot]
                    obs_valid[n_obs] = True
                    n_obs += 1
        obp = build_obs_by_point(np.where(obs_valid, obs_mp, P), P, 4, O)
        cam = self.camera
        res = ba_solve(
            jnp.asarray(kf_R), jnp.asarray(kf_t),
            jnp.asarray(np.array([True, False])), jnp.ones(2, bool),
            jnp.asarray(mp_pos), jnp.asarray(mp_valid),
            jnp.asarray(obs_kf), jnp.asarray(obs_mp), jnp.asarray(obs_uv),
            jnp.asarray(obs_valid), jnp.asarray(obp),
            cam.fx, cam.fy, cam.cx, cam.cy, iters=20,
        )
        kf_cur.set_pose(
            np.asarray(res["kf_R"][1], np.float64), np.asarray(res["kf_t"][1], np.float64)
        )
        X = np.asarray(res["mp_pos"], np.float64)
        for j, mp in enumerate(mps):
            mp.pos = X[j]
            mp.update_normal_and_depth(m)

    def _stereo_initialization(self):
        """Tracking::StereoInitialization (Tracking.cc:520-573)."""
        if self.current.n <= 500:
            return
        m = self.atlas.current
        self.current.set_pose(np.eye(3), np.zeros(3))
        kf = KeyFrame(self.current, m.id)
        m.add_keyframe(kf)
        cam = self.camera
        for i in range(self.current.n):
            z = self.current.depth_right[i] if self.current.depth_right is not None else -1
            if z <= 0:
                continue
            uv = self.current.pts[i]
            x3d = np.array(
                [(uv[0] - cam.cx) * z / cam.fx, (uv[1] - cam.cy) * z / cam.fy, z]
            )
            mp = MapPoint(x3d, kf.id, int(self.current.track_ids[i]), m.id)
            mp.add_observation(kf, i)
            kf.add_mappoint(mp, i)
            mp.update_normal_and_depth(m)
            m.add_mappoint(mp)
            self.current.mappoints[i] = mp
        self.mapper.insert_keyframe(kf)
        self.mapper.spin()
        self.last_frame = self.current
        self.last_kf_frame_id = self.current.id
        self.last_kf = kf
        self.local_kfs = [kf]
        self.local_mps = [mp for mp in m.mappoints.values() if not mp.bad]
        self.reference_kf = kf
        self.current.reference_kf = kf
        m.kf_origins.append(kf)
        self.state = State.OK

    # --- per-frame tracking --------------------------------------------
    def _check_replaced_in_last_frame(self):
        for i, mp in enumerate(self.last_frame.mappoints):
            if mp is not None and mp.replaced_by is not None:
                self.last_frame.mappoints[i] = mp.replaced_by

    def _pose_optimization(self, frame, lost):
        """Optimizer::PoseOptimization via batched device PnP.

        Transfers are fused: one (N, 6) upload, one pytree pull — round
        trips dominate per-frame latency on remote TPUs."""
        cam = self.camera
        slots = [i for i, mp in enumerate(frame.mappoints) if mp is not None]
        if len(slots) < 4:
            return 0
        cap = 2048
        # Stereo rows (ur) join the per-frame solve when available — the
        # round-1 young-map gauge wobble fix (the reference keeps its pose
        # solve mono even in stereo mode, Optimizer.cc:437).
        stereo = frame.uright is not None and self.settings.bf > 0
        data = np.zeros((cap, 7 if stereo else 6), np.float32)
        n = min(len(slots), cap)
        data[:n, 0:3] = np.stack([frame.mappoints[s].pos for s in slots[:n]])
        data[:n, 3:5] = frame.pts[slots[:n]]
        data[:n, 5] = 1.0
        if stereo:
            data[:, 6] = -1.0
            data[:n, 6] = frame.uright[slots[:n]]

        rep = (
            self.settings.reprojection_error_lost
            if lost
            else self.settings.reprojection_error
        )
        prior = np.zeros((4, 3), np.float32)
        prior[:3] = frame.R if frame.pose_set else np.eye(3)
        prior[3] = frame.t if frame.pose_set else 0.0
        self._pnp_key, key = jax.random.split(self._pnp_key)
        res = jax.device_get(
            pnp_ransac_fused(
                jnp.asarray(data), jnp.asarray(prior), self._intr, key,
                float(rep), bf=float(self.settings.bf), stereo=stereo,
            )
        )
        if not bool(res["ok"]):
            return 0
        frame.set_pose(np.asarray(res["R"], np.float64), np.asarray(res["t"], np.float64))
        inl = np.asarray(res["inliers"])
        frame.outlier[:] = True
        for k in range(n):
            frame.outlier[slots[k]] = not inl[k]
        # slots without mappoints are not outliers
        for i in range(frame.n):
            if frame.mappoints[i] is None:
                frame.outlier[i] = False
        return int(res["n_inliers"])

    def _track_reference_keyframe(self):
        """Tracking::TrackReferenceKeyFrame (Tracking.cc:796-814)."""
        import time as _t
        _t0 = _t.perf_counter()
        try:
            return self._track_reference_keyframe_inner()
        finally:
            self.timings["track_ref_kf"].append(1e3 * (_t.perf_counter() - _t0))

    def _track_reference_keyframe_inner(self):
        if self.reference_kf is None:
            return False
        m = self.atlas.current
        self.current.mappoints = [None] * self.current.n
        search_by_video_feature_kf(self.reference_kf, self.current, m)
        if self.last_frame is not None and self.last_frame.pose_set:
            self.current.set_pose(self.last_frame.R, self.last_frame.t)
        self.last_ref_track_count = self._pose_optimization(
            self.current, self.state == State.RECENTLY_LOST
        )
        return self.last_ref_track_count >= 10

    def _relocalization(self):
        """Tracking::Relocalization stub (Tracking.cc:1341-1352): flags the
        frame lost; actual recovery happens in the extractor's LK path next
        frame."""
        self.current.lost = True
        return False

    def _track_local_map(self):
        """Tracking::TrackLocalMap (Tracking.cc:890-945)."""
        import time as _t
        _t0 = _t.perf_counter()
        try:
            return self._track_local_map_inner()
        finally:
            self.timings["track_local_map"].append(1e3 * (_t.perf_counter() - _t0))

    def _track_local_map_inner(self):
        self.tracked_frames += 1
        self._update_local_keyframes()
        self._update_local_points()
        self._search_local_points()
        self._pose_optimization(self.current, self.state == State.RECENTLY_LOST)

        self.matches_inliers = 0
        for i, mp in enumerate(self.current.mappoints):
            if mp is None:
                continue
            if not self.current.outlier[i]:
                mp.n_found += 1
                if mp.n_obs() > 0:
                    self.matches_inliers += 1

        if (
            self.current.id < self.last_reloc_frame_id + self.max_frames
            and self.matches_inliers < 50
        ):
            return False
        if self.state == State.RECENTLY_LOST and self.matches_inliers > 10:
            return True
        return self.matches_inliers >= 30

    def _update_local_keyframes(self):
        """Tracking::UpdateLocalKeyFrames (Tracking.cc:1200-1339)."""
        m = self.atlas.current
        counter = {}
        for mp in self.current.mappoints:
            if mp is None or mp.bad:
                continue
            for kf_id in mp.obs:
                counter[kf_id] = counter.get(kf_id, 0) + 1
        if not counter:
            return
        self.local_kfs = []
        best_kf, best_n = None, 0
        seen = set()
        for kf_id, cnt in counter.items():
            kf = m.keyframes.get(kf_id)
            if kf is None or kf.bad:
                continue
            self.local_kfs.append(kf)
            seen.add(kf_id)
            if cnt > best_n:
                best_n, best_kf = cnt, kf
        # Expand with neighbors until 80 (Tracking.cc:1283-1332): for each
        # seed KF add its first unseen top-10 covisible neighbor, its first
        # unseen spanning-tree child, and its parent — the parent addition
        # breaks the OUTER loop (the reference's quirk, Tracking.cc:1329).
        # Iteration covers only the seed set (itEndKF captured before any
        # push_back).
        for kf in list(self.local_kfs):
            if len(self.local_kfs) > 80:
                break
            for nb in kf.best_covisible(m, 10):
                if not nb.bad and nb.id not in seen:
                    self.local_kfs.append(nb)
                    seen.add(nb.id)
                    break
            for ch_id in kf.children:
                ch = m.keyframes.get(ch_id)
                if ch is not None and not ch.bad and ch.id not in seen:
                    self.local_kfs.append(ch)
                    seen.add(ch.id)
                    break
            parent = kf.parent
            if parent is not None and not parent.bad and parent.id not in seen:
                self.local_kfs.append(parent)
                seen.add(parent.id)
                break
        if best_kf is not None:
            self.reference_kf = best_kf
            self.current.reference_kf = best_kf

    def _update_local_points(self):
        """Tracking::UpdateLocalPoints (Tracking.cc:1171-1198), vectorized:
        one unique() over the concatenated slot arrays, one dict hit per
        unique id."""
        m = self.atlas.current
        if not self.local_kfs:
            self.local_mps = []
            return
        # Preserve the reference's iteration order (reversed local KFs,
        # first occurrence wins): order determines which duplicate-trackid
        # point lands in a frame slot downstream.
        ids_rev = np.concatenate([kf.mp_ids for kf in reversed(self.local_kfs)])
        ids_rev = ids_rev[ids_rev >= 0]
        _, first_idx = np.unique(ids_rev, return_index=True)
        ids = ids_rev[np.sort(first_idx)]
        mps = m.mappoints
        self.local_mps = [
            mp for mp in (mps.get(int(i)) for i in ids) if mp is not None and not mp.bad
        ]

    def _search_local_points(self):
        """Tracking::SearchLocalPoints (Tracking.cc:1109-1158): frustum filter
        + id join. The projection test is vectorized numpy."""
        cam = self.camera
        cur = self.current
        already = set()
        for mp in cur.mappoints:
            if mp is not None:
                if mp.bad:
                    continue
                mp.n_visible += 1
                mp.last_frame_seen = cur.id
                mp.track_in_view = False
                already.add(mp.id)

        cand = [mp for mp in self.local_mps if mp.last_frame_seen != cur.id and not mp.bad]
        if not cand:
            return
        pos = np.stack([mp.pos for mp in cand])
        R, t = cur.R, cur.t
        pc = pos @ R.T + t
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = cam.fx * pc[:, 0] / z + cam.cx
            v = cam.fy * pc[:, 1] / z + cam.cy
        Ow = cur.center()
        po = pos - Ow
        dist = np.linalg.norm(po, axis=-1)
        normals = np.stack([mp.normal for mp in cand])
        cosview = np.einsum("ij,ij->i", po, normals) / np.maximum(dist, 1e-9)
        mind = np.array([mp.min_dist for mp in cand])
        maxd = np.array([mp.max_dist for mp in cand])
        bx0, bx1, by0, by1 = cam.undistorted_bounds()
        ok = (
            (z > 0)
            & (u >= bx0) & (u < bx1)
            & (v >= by0) & (v < by1)
            & (dist >= 0.8 * mind) & (dist <= 1.2 * maxd)
            & (cosview > 0.5)  # viewingCosLimit=0.5 (Tracking.cc:1143)
        )
        n_to_match = 0
        for k, mp in enumerate(cand):
            if ok[k]:
                mp.track_in_view = True
                mp.track_proj = np.array([u[k], v[k]])
                mp.track_depth = dist[k]
                mp.n_visible += 1
                n_to_match += 1
            else:
                mp.track_in_view = False
        if n_to_match > 0:
            search_by_video_feature_local(
                cur, cand, self.mapper.far_points, self.mapper.th_far_points
            )

    # --- keyframe decisions ------------------------------------------------
    def _need_new_keyframe(self):
        """Tracking::NeedNewKeyFrame (Tracking.cc:947-991)."""
        m = self.atlas.current
        n_kfs = m.n_keyframes()
        if (
            self.current.id < self.last_reloc_frame_id + self.max_frames
            and n_kfs > self.max_frames
        ):
            return False
        idle = self.mapper.is_idle()
        c1a = self.current.id >= self.last_kf_frame_id + self.max_frames
        c1b = self.current.id >= self.last_kf_frame_id + self.min_frames and idle
        c2 = self.matches_inliers > 15
        if (c1a or c1b) and c2:
            if idle:
                return True
            self.mapper.abort_ba = True
            return False
        return False

    def _create_new_keyframe(self):
        """Tracking::CreateNewKeyFrame (Tracking.cc:993-1107)."""
        import time as _t
        _t0 = _t.perf_counter()
        self._create_new_keyframe_inner()
        self.timings["new_kf"].append(1e3 * (_t.perf_counter() - _t0))

    def _create_new_keyframe_inner(self):
        m = self.atlas.current
        # Land accumulated visible/found stats before the mapper's
        # MapPointCulling reads found_ratio (fused-path bookkeeping is
        # batched per keyframe, core/snapshot.py).
        snap = getattr(self.system, "_snapshot", None)
        if snap is not None:
            snap.flush_stats()
        kf = KeyFrame(self.current, m.id)
        self.reference_kf = kf
        self.current.reference_kf = kf
        if self.last_kf is not None:
            kf.prev_kf = self.last_kf
            self.last_kf.next_kf = kf

        if self.settings.sensor == 1 and self.current.depth_right is not None:
            self._create_close_stereo_points(kf, m)

        self.mapper.insert_keyframe(kf)
        self.mapper.spin()
        self.last_kf_frame_id = self.current.id
        self.last_kf = kf

    def _create_close_stereo_points(self, kf, m):
        """Stereo KFs spawn close-depth map points (Tracking.cc:1015-1099)."""
        cam = self.camera
        depth = self.current.depth_right
        order = np.argsort(np.where(depth > 0, depth, np.inf))
        n_pts = 0
        for i in order:
            z = depth[i]
            if z <= 0:
                break
            mp = self.current.mappoints[i]
            if mp is None or mp.n_obs() < 1:
                uv = self.current.pts[i]
                Rwc = self.current.R.T
                pc = np.array(
                    [(uv[0] - cam.cx) * z / cam.fx, (uv[1] - cam.cy) * z / cam.fy, z]
                )
                x3d = Rwc @ (pc - self.current.t)
                mp = MapPoint(x3d, kf.id, int(self.current.track_ids[i]), m.id)
                mp.add_observation(kf, int(i))
                kf.add_mappoint(mp, int(i))
                mp.update_normal_and_depth(m)
                m.add_mappoint(mp)
                self.current.mappoints[i] = mp
            n_pts += 1
            if z > self.settings.th_depth_m and n_pts > 100:
                break

    # --- resets ----------------------------------------------------------
    def _create_map_in_atlas(self):
        """Tracking::CreateMapInAtlas (Tracking.cc:750-777)."""
        self.atlas.create_new_map()
        self.state = State.NO_IMAGES_YET
        self.velocity = None
        self.ready_to_init = False
        self.last_kf = None
        self.reference_kf = None
        self.last_frame = None
        self.current = None
        self.extractor_reset = True

    def reset_active_map(self):
        m = self.atlas.current
        m.clear()
        self.state = State.NO_IMAGES_YET
        self.ready_to_init = False
        self.velocity = None
        self.last_kf = None
        self.reference_kf = None
        self.last_frame = None
        self.mapper.recent_points = []
        self.mapper.queue.clear()
