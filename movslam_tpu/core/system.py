"""System: the public SLAM facade.

Mirrors the reference's System API (/root/reference/include/System.h:96-189):
construction from a settings YAML + sensor, TrackMonocular/TrackStereo,
Shutdown, trajectory savers, atlas save/load, lost-frame/fps counters — with
the three reference threads (Tracking / LocalMapping / Viewer,
System.cc:129,153) replaced by a deterministic synchronous drive by default
(mapper work still overlaps the host via async device dispatch) and an
optional background mapping thread.
"""
from __future__ import annotations

import pickle
import time

import numpy as np

from ..config.settings import MONOCULAR, STEREO, Settings
from ..io.mvimage import MotionVectorImage
from .extractor import MOVExtractor
from .frame import Frame
from .local_mapping import LocalMapping
from .map import Atlas
from .tracking import State, Tracking
from . import trajectory as traj
from .verbose import Verbose


class System:
    MONOCULAR = MONOCULAR
    STEREO = STEREO

    def __init__(self, settings_file, sensor=MONOCULAR, use_viewer=False,
                 init_frame=0, sequence="", video_tracking=True,
                 async_mapping=False):
        self.settings = (
            settings_file
            if isinstance(settings_file, Settings)
            else Settings.from_yaml(settings_file, sensor)
        )
        self.sensor = sensor
        Verbose.log(f"Input sensor set to: {'Monocular' if sensor == MONOCULAR else 'Stereo'}")

        self.atlas = Atlas()
        self.atlas.add_camera(self.settings.camera1)
        self.mapper = LocalMapping(
            self.atlas,
            self.settings.camera1,
            monocular=(sensor == MONOCULAR),
            far_points=self.settings.th_far_points,
            bf=self.settings.bf,
            stereo_b=self.settings.b,
        )
        self.extractor = MOVExtractor(
            threshold=self.settings.threshold,
            coverage_threshold=self.settings.coverage_threshold,
            relocalization_distance=self.settings.relocalization_distance,
        )
        self.tracking = Tracking(self, self.atlas, self.mapper, self.settings, self.extractor)

        self._prev_state = None
        self._prev_img = None
        self._reset_requested = False
        self._snapshot = None
        self._snapshot_key = None
        # Fused one-dispatch frame path (ops/frame_step); legacy per-stage
        # path remains for init/loss states and as a fallback.
        self.fused_frontend = True

        self.image_count = 0
        self.track_ms = []

        self.async_mapping = async_mapping
        if async_mapping:
            self.mapper.start_thread()

        self.viewer = None
        if use_viewer:
            from ..viz.viewer import Viewer

            self.viewer = Viewer(self)

        if self.settings.load_atlas:
            try:
                self.load_atlas(self.settings.load_atlas)
            except FileNotFoundError:
                Verbose.log(f"Atlas file not found: {self.settings.load_atlas}")

    # ------------------------------------------------------------------
    def _build_reloc(self):
        """Projected map points of the reference KF for the extractor's LK
        recovery path (MOVExtractor.cc:161-243)."""
        tr = self.tracking
        kf = tr.reference_kf
        lf = tr.last_frame
        if kf is None or lf is None or not lf.pose_set:
            return None
        m = self.atlas.current
        cam = self.settings.camera1
        cap = 512
        proj = np.zeros((cap, 2), np.float32)
        valid = np.zeros(cap, bool)
        ids = np.full(cap, -1, np.int32)
        n = 0
        R, t = lf.R, lf.t
        for mid in kf.mp_ids:
            if mid < 0 or n >= cap:
                continue
            mp = m.mappoints.get(int(mid))
            if mp is None or mp.bad:
                continue
            pc = R @ mp.pos + t
            if pc[2] <= 0:
                continue
            u = cam.fx * pc[0] / pc[2] + cam.cx
            v = cam.fy * pc[1] / pc[2] + cam.cy
            if not (0 <= u < cam.width and 0 <= v < cam.height):
                continue
            proj[n] = (u, v)
            ids[n] = mp.track_id
            valid[n] = True
            n += 1
        if n == 0:
            return None
        return {
            "kf_img": kf.image,
            "proj_pts": proj,
            "proj_valid": valid,
            "track_ids": ids,
        }

    def _refresh_snapshot(self):
        """(Re)publish the device map snapshot when the reference KF or the
        map version changed (once per keyframe, not per frame)."""
        tr = self.tracking
        m = self.atlas.current
        if tr.reference_kf is None:
            self._snapshot = None
            return
        key = (m.id, tr.reference_kf.id, m.change_index)
        if self._snapshot is not None and self._snapshot_key == key:
            return
        from .snapshot import build_snapshot

        with self.mapper.map_lock:
            self._snapshot = build_snapshot(m, tr.reference_kf)
        self._snapshot_key = key

    def _track_monocular_fused(self, timestamp, smv, img_dev):
        """One-dispatch frame path (ops/frame_step): OK-state frames only."""
        import jax
        import jax.numpy as jnp
        from ..ops.frame_step import tracked_frame_step

        tr = self.tracking
        self._refresh_snapshot()
        snap = self._snapshot
        if snap is None:
            return False

        mvk_pack, n_mvs = smv.packed_joint()
        # Constant-velocity motion model (Tracking.cc:414-424): seed the PnP
        # prior lane and GN refinement with T_vel * T_last instead of T_last.
        R_prior, t_prior = tr.last_frame.R, tr.last_frame.t
        if tr.velocity is not None:
            Rv, tv = tr.velocity
            R_prior = Rv @ R_prior
            t_prior = Rv @ t_prior + tv
        # aux rides as two trailer rows of mvk_pack: ONE upload for all
        # per-frame data (img aside).
        trailer = np.zeros((2, 8), np.float32)
        trailer.reshape(-1)[0:9] = np.asarray(R_prior, np.float32).reshape(-1)
        trailer.reshape(-1)[9:12] = t_prior
        trailer.reshape(-1)[12] = smv.coverage_area
        out = tracked_frame_step(
            img_dev,
            self._prev_img,
            self._prev_state,
            jnp.asarray(np.concatenate([mvk_pack, trailer])),
            None,
            snap.tid_sorted, snap.perm, snap.pack,
            tr._intr,
            tr._pnp_key,
            n_mvs=n_mvs,
            reproj_err=float(self.settings.reprojection_error),
            threshold=float(self.extractor.threshold),
            coverage_threshold=float(self.extractor.coverage_threshold),
            capacity=self.extractor.capacity,
            max_cov=512,
        )
        tr._pnp_key = out["key"]
        state = out["state"]
        # ONE pull (device_get is one RPC per pytree LEAF on the remote TPU):
        # wire = N*14 packed | 15 scalars | P visibility flags.
        wire = np.asarray(out["wire"])
        N = self.extractor.capacity
        packed = wire[: N * 14].reshape(N, 14)
        scal = wire[N * 14 : N * 14 + 15]
        vis = wire[N * 14 + 15 :] > 0
        frame = Frame.from_packed(
            packed, timestamp=timestamp, image=smv.im_gray, fid=self.image_count
        )
        host_out = {
            "R": scal[0:9].reshape(3, 3).astype(np.float64),
            "t": scal[9:12].astype(np.float64),
            "n_ref_inliers": int(scal[12]),
            "n_inliers": int(scal[13]),
            "ok": scal[14] > 0,
            "snap_visible": vis,
        }
        self._prev_state = state
        self.extractor._next_id_dev = state.next_id
        tr.track_fused(frame, host_out, snap)
        return True

    def track_monocular(self, timestamp, smv: MotionVectorImage):
        """System::TrackMonocular (System.cc:171-234). Returns (R, t) of the
        current camera-from-world pose or None while initializing/lost."""
        assert self.sensor == MONOCULAR, "sensor not set to Monocular"
        t0 = time.perf_counter()

        if self._reset_requested:
            self._prev_state = None
            self._snapshot = None
            self._reset_requested = False

        import jax.numpy as jnp

        tr = self.tracking
        img_dev = jnp.asarray(smv.im_gray)  # single upload, reused next frame

        fused_done = False
        if (
            self.fused_frontend
            and tr.state == State.OK
            and self._prev_state is not None
            and tr.last_frame is not None
            and tr.last_frame.pose_set
            and not tr.last_frame.lost
            and smv.ft != 0  # P-frames only; I-frames take the LK path
        ):
            fused_done = self._track_monocular_fused(timestamp, smv, img_dev)
            if fused_done:
                self._prev_img = img_dev
                self.mapper.tick()

        if not fused_done:
            reloc = None
            if (
                tr.last_frame is not None
                and tr.last_frame.lost
                and tr.state == State.RECENTLY_LOST
            ):
                reloc = self._build_reloc()

            state = self.extractor.extract(
                smv, self._prev_state, self._prev_img, reloc, img_dev=img_dev
            )
            frame = Frame(state, timestamp=timestamp, image=smv.im_gray, fid=self.image_count)
            self._prev_state = state
            self._prev_img = img_dev

            self.mapper.tick()
            tr.grab_frame(frame)

        self.image_count += 1
        self.track_ms.append(1e3 * (time.perf_counter() - t0))
        if self.viewer is not None and tr.current is not None:
            self.viewer.update(tr.current, smv)
        if tr.current is not None and tr.current.pose_set:
            return tr.current.R, tr.current.t
        return None

    def track_stereo(self, timestamp, smv, smv_right):
        """System::TrackStereo (System.cc:236-300)."""
        assert self.sensor == STEREO, "sensor not set to Stereo"
        from .stereo import compute_stereo_depth

        t0 = time.perf_counter()
        if self._reset_requested:
            self._prev_state = None
            self._reset_requested = False

        reloc = None
        tr = self.tracking
        if (
            tr.last_frame is not None
            and tr.last_frame.lost
            and tr.state == State.RECENTLY_LOST
        ):
            reloc = self._build_reloc()

        state = self.extractor.extract(smv, self._prev_state, self._prev_img, reloc)
        frame = Frame(state, timestamp=timestamp, image=smv.im_gray, fid=self.image_count)
        compute_stereo_depth(frame, smv.im_gray, smv_right.im_gray, self.settings)
        self._prev_state = state
        self._prev_img = smv.im_gray

        self.mapper.tick()
        tr.grab_frame(frame)
        self.image_count += 1
        self.track_ms.append(1e3 * (time.perf_counter() - t0))
        if self.viewer is not None:
            self.viewer.update(frame, smv)
        if tr.current is not None and tr.current.pose_set:
            return tr.current.R, tr.current.t
        return None

    # --- control ---------------------------------------------------------
    def reset_active_map(self):
        Verbose.log("SYSTEM-> Resetting active map")
        self.tracking.reset_active_map()
        self._reset_requested = True

    def global_bundle_adjustment(self, iters=20):
        """Full-map BA over the active map (System::GlobalBundleAdjustment,
        System.cc:162-169): every keyframe optimized (origin fixed),
        synchronous writeback under the map lock."""
        from .local_mapping import global_bundle_adjustment

        self.mapper.spin(final=True)  # drain queue + commit pending LBA first
        global_bundle_adjustment(
            self.atlas.current, self.mapper.camera, bf=self.mapper.bf,
            iters=iters, map_lock=self.mapper.map_lock,
        )

    def shutdown(self):
        if self.async_mapping:
            self.mapper.stop_thread()
        self.mapper.spin(final=True)
        if self.settings.save_atlas:
            self.save_atlas(self.settings.save_atlas)

    # --- counters (results.txt contract) -----------------------------------
    def get_total_lost(self):
        return self.tracking.lost_count

    def get_fps(self):
        return self.settings.fps

    def mean_track_ms(self):
        return float(np.mean(self.track_ms)) if self.track_ms else 0.0

    def get_timings(self):
        """Per-stage timing summary (ms): the REGISTER_TIMES equivalent
        (reference include/Tracking.h:165-178, LocalMapping.h:107-123)."""
        def stats(xs):
            if not xs:
                return {"n": 0}
            a = np.asarray(xs)
            return {
                "n": len(a), "mean": float(a.mean()),
                "p50": float(np.percentile(a, 50)),
                "p95": float(np.percentile(a, 95)),
            }

        out = {k: stats(v) for k, v in self.tracking.timings.items()}
        out["frame_total"] = stats(self.track_ms)
        out["local_ba"] = stats(self.mapper.lba_ms)
        return out

    # --- savers ------------------------------------------------------------
    def save_keyframe_trajectory_kitti(self, filename):
        traj.save_keyframe_trajectory_kitti(self.atlas, filename)

    def save_keyframe_trajectory_euroc(self, filename):
        traj.save_keyframe_trajectory_euroc(self.atlas, filename)

    def save_keyframe_trajectory_tum(self, filename):
        traj.save_keyframe_trajectory_tum(self.atlas, filename)

    def save_trajectory_euroc(self, filename):
        traj.save_frame_trajectory(self.tracking, filename, scale_ts=1e9)

    def save_trajectory_tum(self, filename):
        traj.save_frame_trajectory(self.tracking, filename, scale_ts=1.0)

    def save_point_cloud(self, filename):
        traj.save_point_cloud(self.atlas, filename)

    # --- checkpoint (System::SaveAtlas/LoadAtlas, System.cc:1014-1098) ------
    def save_atlas(self, filename):
        from .checkpoint import save_atlas

        save_atlas(self.atlas, filename)
        Verbose.log(f"Atlas saved to {filename}")

    def load_atlas(self, filename):
        from .checkpoint import load_atlas

        self.atlas = load_atlas(filename)
        self.mapper.atlas = self.atlas
        self.tracking.atlas = self.atlas
        Verbose.log(f"Atlas loaded from {filename}")
