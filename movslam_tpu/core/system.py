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

import time

import numpy as np

from ..config.settings import IMU_MONOCULAR, MONOCULAR, STEREO, Settings
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
    IMU_MONOCULAR = IMU_MONOCULAR

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
            monocular=(sensor != STEREO),
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
        # In-flight window queue of the pipelined batch drive (dispatched,
        # not yet replayed; oldest first, each chained on the previous one's
        # device carry) + host-side lookahead of frames buffered across
        # batch calls (lets windows span caller batch boundaries so the
        # KF-aligned schedule stays in phase). See _batch_drive.
        self._wfq = []
        self._pending = []
        # Pipeline depth: how many windows may be in flight at once. At 1
        # the device idles from a window's completion until the host has
        # pulled its wire and uploaded the next window's inputs; at 2 the
        # device always has the next window queued, so throughput becomes
        # max(device window time, host replay time) instead of their sum.
        # Speculation guards in _collect_run (mature map, KF-aligned
        # windows) keep deep-pipeline rewinds rare.
        self.pipeline_depth = 2
        self._zero_patch = None  # cached no-op snapshot-patch arrays
        self._zero_mwires = None  # cached no-op fused-mapper wires
        # Optional sub-stage profiling accumulator (tools/profile_drive.py):
        # set to a defaultdict(float) to collect per-stage seconds.
        self._prof = None
        # Fused one-dispatch frame path (ops/frame_step); legacy per-stage
        # path remains for init/loss states and as a fallback.
        self.fused_frontend = True
        # Windowed front end (ops/window_step): W frames per device dispatch
        # when the caller feeds batches (track_monocular_batch). Mirrors the
        # reference's 12-deep decoder lookahead queue (VideoDecoder.cc:163).
        self.window = 8
        # Distortion pack for the device programs: (k1 k2 p1 p2 k3) +
        # undistorted image bounds (Frame::ComputeImageBounds equivalent).
        cam = self.settings.camera1
        self._has_dist = bool(cam.dist and any(cam.dist))
        d = list(cam.dist) + [0.0] * (5 - len(cam.dist)) if cam.dist else [0.0] * 5
        bounds = list(cam.undistorted_bounds())
        self._dist_pack = np.asarray(d[:5] + bounds + [self.settings.bf], np.float32)
        self._un_bounds = bounds

        # Visual-inertial: per-frame IMU sample buffer + mapper init hook
        # (core/inertial.py completes the circuit the reference leaves unfed).
        self.imu_buffer = None
        if sensor == IMU_MONOCULAR:
            from .inertial import ImuBuffer

            self.imu_buffer = ImuBuffer()
            self.mapper.imu_buffer = self.imu_buffer
            self.mapper.imu_noise = (
                self.settings.imu_noise_gyro, self.settings.imu_noise_acc
            )

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
        map version changed (once per keyframe, not per frame). The trailing
        C_PATCH rows stay reserved for the windowed drive's device-side
        deferred-mapper patch (ops/window_step._apply_patch)."""
        from ..ops.mapper_step import C_PATCH

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
            if self._snapshot is not None:
                self._snapshot.flush_stats()
            self._snapshot = build_snapshot(m, tr.reference_kf, reserve=C_PATCH)
        self._snapshot_key = key

    def _patch_inputs(self, snap):
        """Device-side snapshot patch for a window dispatch: the pending
        (dispatched, uncommitted) deferred mapper job's device-resident
        results + host row metadata. Returns (patch_tri, patch_mp,
        patch_meta, job) — zero-filled no-op arrays when nothing is pending,
        so the window program keeps ONE compiled signature."""
        import jax.numpy as jnp
        from ..ops.frame_step import SNAP_CAP
        from ..ops.mapper_step import C_PATCH, P_PATCH

        d = self.mapper._deferred
        pending = (
            d is not None
            and not d.get("committed")
            and d["map"] is self.atlas.current
        )
        if not pending:
            if self._zero_patch is None:
                meta = np.full(P_PATCH + 1, SNAP_CAP, np.float32)
                meta[0] = 0.0
                self._zero_patch = (
                    jnp.zeros((C_PATCH, 10), jnp.float32),
                    jnp.zeros((P_PATCH, 3), jnp.float32),
                    jnp.asarray(meta),
                )
            return self._zero_patch + (None,)

        return (
            d["out"]["patch_tri"], d["out"]["patch_mp"],
            jnp.asarray(self._ba_patch_meta(snap, d.get("ba"))), d,
        )

    @staticmethod
    def _ba_patch_meta(snap, ba):
        """Patch row metadata for a mapper job's BA side: meta[0] = base-row
        count for the triangulation rows, meta[1:] = BA point -> base
        snapshot row by track id (first-wins order matches the device's
        stable searchsorted); SNAP_CAP rows drop."""
        from ..ops.frame_step import SNAP_CAP
        from ..ops.mapper_step import P_PATCH

        n_base = len(snap.mps)
        meta = np.full(P_PATCH + 1, SNAP_CAP, np.float32)  # cap row = drop
        meta[0] = n_base
        if ba is not None and n_base:
            order, sorted_tids = snap.tid_order()
            tids = np.fromiter(
                (mp.track_id for mp in ba["mps"]), np.int64, len(ba["mps"])
            )[:P_PATCH]
            pos = np.searchsorted(sorted_tids, tids)
            pos_c = np.minimum(pos, n_base - 1)
            hit = sorted_tids[pos_c] == tids
            meta[1 : len(tids) + 1] = np.where(
                hit, order[pos_c], SNAP_CAP
            ).astype(np.float32)
        return meta

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
        from ..ops.frame_step import N_SCALARS, packed_cols, unpack_bits_np

        out = tracked_frame_step(
            img_dev,
            self._prev_img,
            self._prev_state,
            jnp.asarray(np.concatenate([mvk_pack, trailer])),
            None,
            snap.fused,
            tr._intr,
            tr._pnp_key,
            jnp.asarray(self._dist_pack),
            n_mvs=n_mvs,
            reproj_err=float(self.settings.reprojection_error),
            threshold=float(self.extractor.threshold),
            coverage_threshold=float(self.extractor.coverage_threshold),
            capacity=self.extractor.capacity,
            max_cov=512,
            has_dist=self._has_dist,
        )
        tr._pnp_key = out["key"]
        state = out["state"]
        # ONE pull (device_get is one RPC per pytree LEAF on the remote TPU):
        # wire = N*packed_cols | N_SCALARS | P/32 visibility bit-words.
        C = packed_cols(self._has_dist, False)
        wire = np.asarray(out["wire"])
        N = self.extractor.capacity
        packed = wire[: N * C].reshape(N, C)
        scal = wire[N * C : N * C + N_SCALARS]
        P = snap.fused.shape[0]
        vis = unpack_bits_np(wire[N * C + N_SCALARS :], P)
        frame = Frame.from_packed(
            packed, timestamp=timestamp, image=smv.im_gray,
            fid=self.image_count, has_dist=self._has_dist,
        )
        pose = np.ascontiguousarray(scal[0:12]).view(np.float32)
        host_out = {
            "R": pose[0:9].reshape(3, 3).astype(np.float64),
            "t": pose[9:12].astype(np.float64),
            "n_ref_inliers": int(scal[12]),
            "n_inliers": int(scal[13]),
            "ok": scal[14] > 0,
            "snap_visible": vis,
        }
        self._prev_state = state
        self.extractor._next_id_dev = state.next_id
        tr.track_fused(frame, host_out, snap)
        return True

    # --- windowed front end (W frames / dispatch) -------------------------
    def _window_eligible(self, smv):
        tr = self.tracking
        from ..io.mvimage import FrameType

        return (
            self.fused_frontend
            and self.window >= 2
            and tr.state == State.OK
            and self._prev_state is not None
            and self._prev_img is not None
            and tr.last_frame is not None
            and tr.last_frame.pose_set
            and not tr.last_frame.lost
            and smv.ft != FrameType.I_FRAME
        )

    def track_monocular_batch(self, items, flush=True):
        """Track a batch of (timestamp, smv) pairs; returns poses (R, t) or
        None in stream order. Eligible P-frame runs in the OK state go
        through the windowed W-frames-per-dispatch program (ops/window_step);
        init, loss recovery and I-frames fall back to the per-frame paths.
        This is the high-throughput drive: the decoder's lookahead queue
        (VideoDecoder.cc:163-368) always holds a window's worth of frames.

        The drive is PIPELINED: while window k's results are replayed through
        the Tracking state machine on the host, window k+1 is already
        executing on device, chained on k's device-resident carry (track
        state, pose chain, PRNG). flush=False keeps the last window in
        flight across calls (the returned pose list then lags the input by
        up to one window; call once more with flush=True — or items=[] — to
        drain). With the default flush=True every passed frame is resolved
        before returning."""
        items = [it if len(it) == 2 else it[:2] for it in items] \
            if self.imu_buffer is None else self._absorb_imu(items)
        return self._batch_drive(items, flush, per_frame=self.track_monocular)

    def _batch_drive(self, items, flush, per_frame):
        results = []
        todo = self._pending + list(items)
        self._pending = []
        wfq = self._wfq
        while todo:
            # Host-side lookahead: with flush=False, fewer than a full
            # window's frames stay buffered for the next call instead of
            # being forced into fragmented short windows — the KF-aligned
            # window schedule is W-periodic but phase-shifted from the
            # caller's batch boundaries (the reference decoder's 12-deep
            # vqueue provides exactly this slack, VideoDecoder.cc:163-368).
            if (
                not flush
                and len(todo) < self.window
                and (
                    wfq
                    or (self._window_eligible(todo[0][1])
                        and self._snapshot is not None)
                )
            ):
                self._pending = todo
                return results
            # Fill the pipeline: dispatch windows until the depth cap or
            # until nothing at the head of todo is window-eligible. Each
            # dispatch beyond the first chains SPECULATIVELY on the previous
            # window's device carry (state, pose chain, PRNG) — its compute
            # overlaps the replays below. The previous keyframe's deferred
            # mapper results ride each dispatch as a DEVICE-side snapshot
            # patch (_patch_inputs) or as the window-fused mapper job
            # (take_staged), so windows track at most one KF stale without
            # any blocking commit. Fills happen BEFORE the oldest replay:
            # by then that window's compute finished long ago (the device
            # has been working on its successor), so its prefetched wire is
            # already host-resident and the fill's uploads don't stall it
            # on the serial tunnel channel.
            while len(wfq) < self.pipeline_depth and todo:
                run = self._collect_run(todo, speculative=bool(wfq))
                if run is None:
                    break
                wf = self._dispatch_window(
                    run, carry=wfq[-1] if wfq else None
                )
                if wf is None:
                    break
                wfq.append(wf)
                del todo[: len(run)]
            if not wfq:
                # Per-frame fallback (I-frame at head, init/loss states, no
                # snapshot). No window will carry a staged mapper job or
                # the deferred patch: launch any staged job standalone now
                # (async) and land whatever already finished, so the
                # per-frame path doesn't track a snapshot missing the last
                # keyframe's triangulations.
                self.mapper.dispatch_staged_async()
                self.mapper.poke_commit(blocking=False)
                results.append(per_frame(*todo.pop(0)))
                continue
            # Replay the OLDEST in-flight window (the single host<->device
            # sync point per window).
            wf = wfq.pop(0)
            t0 = time.perf_counter()
            wire_np = np.asarray(wf["out"]["wire"])
            if self._prof is not None:
                self._prof["pull_early"] += time.perf_counter() - t0
            poses, consumed, clean = self._replay_window(wf, wire_np)
            results.extend(poses)
            if not clean:
                # Rewind: every downstream window chained on a now-invalid
                # carry — discard them all; their frames re-feed in order.
                # A window-fused mapper job a discarded window carried never
                # commits from a discarded wire: put it back for the next
                # dispatch (its wires are pure host data, re-running is
                # free).
                refeed = list(wf["run"][consumed:])
                for w2 in wfq:
                    self.mapper.restage(w2.get("fused_job"))
                    refeed.extend(w2["run"])
                wfq.clear()
                todo[:0] = refeed
        if flush:
            while wfq:
                wf = wfq.pop(0)
                poses, consumed, clean = self._replay_window(wf)
                results.extend(poses)
                if not clean:
                    refeed = list(wf["run"][consumed:])
                    for w2 in wfq:
                        self.mapper.restage(w2.get("fused_job"))
                        refeed.extend(w2["run"])
                    wfq.clear()
                    for it in refeed:
                        results.append(per_frame(*it))
        return results

    def _sim_kf_schedule(self, start_count, cooldown, last_kf_id, n):
        """Forward-simulate the keyframe decision over the next n OK frames.

        The windowed drive's keyframe timing is DETERMINISTIC on the host:
        NeedNewKeyFrame (Tracking.cc:947-991, c2 = matches > 15 which holds
        whenever tracking is OK) fires exactly when the frames-mode mapper
        cooldown expires. Mirrors the replay loop's order (KF decision inside
        track_fused, then mapper.tick()). Returns (kf_offsets, cooldown_end,
        last_kf_end) so window boundaries can be placed ON keyframes —
        a mid-window keyframe leaves the rest of the window tracking a stale
        snapshot (the round-2 design rewound those at a ~2x throughput cost)."""
        tr = self.tracking
        if tr.only_tracking:
            # Localization mode: no keyframes ever fire; windows just cap
            # at W and the cooldown ticks down.
            return [], max(0, cooldown - n), last_kf_id
        nkfs = self.atlas.current.n_keyframes()
        busy = self.mapper.busy_frames
        offs = []
        c, lk = cooldown, last_kf_id
        for j in range(n):
            fid = start_count + j
            reloc_gate = (
                fid < tr.last_reloc_frame_id + tr.max_frames
                and nkfs > tr.max_frames
            )
            idle = c == 0
            eligible = (
                fid >= lk + tr.max_frames
                or fid >= lk + tr.min_frames
            )
            if idle and eligible and not reloc_gate:
                offs.append(j)
                lk = fid
                c = busy  # insert_keyframe resets the cooldown
                nkfs += 1
            if c > 0:
                c -= 1  # mapper.tick()
        return offs, c, lk

    def _collect_run(self, todo, speculative=False):
        """Collect a power-of-two-bucketed window run from the head of todo,
        sized so that a predicted keyframe lands on the window's LAST frame
        (then nothing tracks against the stale snapshot and no rewind is ever
        needed). speculative=True skips the host tracking-state checks (the
        state is not known yet — the previous window has not been replayed)
        and requires a mature map, where speculation pays."""
        from ..io.mvimage import FrameType

        if not todo:
            return None
        if speculative:
            if not (self.fused_frontend and self.window >= 2):
                return None
            if self.atlas.current.n_keyframes() < 10:
                return None
            if todo[0][1].ft == FrameType.I_FRAME:
                return None
        elif not self._window_eligible(todo[0][1]):
            return None
        run = []
        for it in todo:
            if len(run) >= self.window or it[1].ft == FrameType.I_FRAME:
                break
            run.append(it)
        L = 1 << (len(run).bit_length() - 1) if run else 0
        # Align the window end with the next predicted keyframe. For a
        # speculative run the in-flight windows haven't been replayed yet,
        # so predict from the NEWEST one's simulated exit state (stored at
        # dispatch).
        if speculative and self._wfq:
            start, cool, lastkf = self._wfq[-1]["sched_exit"]
        else:
            start = self.image_count
            cool = self.mapper.cooldown
            lastkf = self.tracking.last_kf_frame_id
        offs, _, _ = self._sim_kf_schedule(start, cool, lastkf, len(run))
        if offs and offs[0] + 1 >= 2:
            # Largest power-of-two window that ends at or before the KF
            # frame: ending ON it is ideal (KF at last slot, zero staleness);
            # ending before it is clean too (no KF inside). Never straddle
            # when a shorter window can avoid it.
            L = min(L, 1 << ((offs[0] + 1).bit_length() - 1))
        elif offs and offs[0] == 0 and len(run) >= self.window:
            # The KF is due at the window's FIRST frame. Accepting locks the
            # schedule into its worst phase: with the mature-map cooldown
            # equal to the window length, KFs and window boundaries are both
            # W-periodic, so every subsequent window starts on a keyframe
            # and W-1 frames track a stale snapshot (measured: 19/22 windows
            # phase-locked at offset 0, inlier decay + rewinds). Decline the
            # window — the head frame goes through the per-frame path, which
            # shifts the window phase by one so the NEXT windows end exactly
            # ON their keyframes (offset W-1, zero staleness), a stable
            # alignment. One per-frame dispatch per lock event.
            if self._prof is not None:
                self._prof["pred_kf_realign"] += 1
            return None
        run = run[:L]
        if self._prof is not None:
            o0 = offs[0] if offs else -1
            self._prof[f"pred_kf_{o0}_len_{len(run)}_spec_{int(speculative)}"] += 1
        return run if len(run) >= 2 else None

    def _absorb_imu(self, items):
        """Strip per-item IMU arrays from (ts, smv, imu) batch tuples into
        the buffer, keyed by the frame ids the items will get (frames still
        in flight or buffered in the host lookahead shift those ids)."""
        ahead = len(self._pending) + sum(
            len(wf["run"]) for wf in self._wfq
        )
        out = []
        for k, it in enumerate(items):
            if len(it) == 3 and it[2] is not None:
                self.imu_buffer.add(self.image_count + ahead + k, it[2])
            out.append((it[0], it[1]))
        return out

    def _dispatch_window(self, run, carry=None):
        """Dispatch one W-frame window program (no blocking device wait).

        carry=None chains on the host tracking state (pose chain, previous
        image/state — the normal entry after per-frame tracking). carry=<an
        in-flight window record> chains on that window's device-resident
        outputs (state, pose_carry, PRNG) WITHOUT pulling them — the
        pipelined drive. Returns the in-flight record, or None when no map
        snapshot exists yet.

        run items: (ts, smv) for mono, (ts, smv, smv_right) for stereo — the
        stereo window adds the right-image stack and the on-device
        left->right LK depth (ops/frame_step stage 1c)."""
        import jax.numpy as jnp
        from ..ops.window_step import tracked_window_step

        prof = self._prof
        _t = time.perf_counter
        t0 = _t()
        stereo = len(run[0]) == 3
        tr = self.tracking
        # No snapshot can exist without a reference keyframe: bail before
        # packing/uploading the window's tensors (they would be wasted work
        # and H2D transfers on a doomed dispatch).
        if tr.reference_kf is None:
            return None
        # Windowed drive: deterministic frame-count mapper throttle (the
        # wall-clock is_ready poll starves KFs when W frames replay in
        # microseconds; the reference mapper is busy ~1-3 frame times per KF,
        # LocalMapping.cc:57,106) + deferred fused mapper (keyframe
        # triangulation/BA overlap the next window's tracking).
        self.mapper.throttle_mode = "frames"
        self.mapper.defer_mapping = True
        self.mapper.fuse_mapper = True
        # Adaptive cadence: a young map needs dense keyframes (losses at
        # sparse cadence happen in the first seconds); a mature one gets a
        # cooldown of exactly the window length, so the deterministic KF
        # schedule (_sim_kf_schedule) lands one keyframe on the LAST frame of
        # each full window — zero stale-snapshot frames, zero rewinds.
        self.mapper.busy_frames = (
            3 if self.atlas.current.n_keyframes() < 8 else self.window
        )
        mvks = []
        n_mvs = None
        for it in run:
            smv = it[1]
            mvk, m = smv.packed_joint_i16()
            mvks.append(mvk)
            n_mvs = m if n_mvs is None else n_mvs
            assert m == n_mvs, "mixed MV capacities within a window"
        if prof is not None:
            prof["disp_pack_host"] += _t() - t0
            t0 = _t()
        mvk_stack = jnp.asarray(np.stack(mvks))
        imgs_dev = jnp.asarray(np.stack([it[1].im_gray for it in run]))
        imgs_right = (
            jnp.asarray(np.stack([it[2].im_gray for it in run]))
            if stereo else None
        )
        if prof is not None:
            prof["disp_upload"] += _t() - t0
            t0 = _t()
        # The pending deferred mapper job is NOT committed here (round 3
        # blocked ~40 ms/window pulling it): the snapshot is built from the
        # host graph as-is and the pending job's device-resident results ride
        # into the window program as a snapshot PATCH (_patch_inputs /
        # ops/window_step._apply_patch) — the window tracks against
        # base + patch, exactly as fresh as the old blocking commit, with the
        # host graph catching up at replay time from the prefetched wire.
        self._refresh_snapshot()
        snap = self._snapshot
        if snap is None:
            return None
        patch_tri, patch_mp, patch_meta, patch_job = self._patch_inputs(snap)
        # Window-fused mapper: the keyframe staged at the last replay rides
        # THIS dispatch (wires up, patch in-program, result on the window
        # wire — see ops/window_step). Mutually exclusive with a pending
        # standalone job per cycle; zero-filled wires otherwise (the
        # in-program flag mtri[0,30] gates the patch).
        staged = self.mapper.take_staged(self.atlas.current)
        if staged is not None and patch_job is not None:
            # Both pending can only happen after an irregular schedule (e.g.
            # a standalone BIG job still in flight when a SMALL one staged):
            # land the standalone one now so one patch source remains, then
            # REBUILD the snapshot — the blocking commit just inserted that
            # job's triangulations into the host graph, and a snapshot built
            # before it would leave them invisible to this window (the
            # recomputed patch is the zero patch).
            self.mapper.poke_commit(blocking=True)
            self._refresh_snapshot()
            snap = self._snapshot
            if snap is None:
                return None
            patch_tri, patch_mp, patch_meta, patch_job = (
                self._patch_inputs(snap)
            )
        if staged is not None:
            mtri = jnp.asarray(staged["tri_wire"])
            mba = jnp.asarray(staged["ba_wire"])
            patch_meta = jnp.asarray(
                self._ba_patch_meta(snap, staged.get("ba"))
            )
        else:
            if self._zero_mwires is None:
                from ..ops.mapper_step import BA_MOPP, MAPPER_SMALL

                sz = MAPPER_SMALL
                self._zero_mwires = (
                    jnp.zeros((sz["C"] + 1, 32), jnp.float32),
                    jnp.zeros(
                        sz["K"] * 14 + sz["P"] * 4 + sz["O"] * 6
                        + sz["P"] * BA_MOPP,
                        jnp.float32,
                    ),
                )
            mtri, mba = self._zero_mwires
        if prof is not None:
            prof["disp_commit_snap"] += _t() - t0
            t0 = _t()

        if carry is None:
            prev_state = self._prev_state
            prev_img = self._prev_img
            pose_pack = np.zeros(25, np.float32)
            pose_pack[0:9] = np.asarray(tr.last_frame.R, np.float32).reshape(-1)
            pose_pack[9:12] = tr.last_frame.t
            if tr.velocity is not None:
                Rv, tv = tr.velocity
                pose_pack[12:21] = np.asarray(Rv, np.float32).reshape(-1)
                pose_pack[21:24] = tv
                pose_pack[24] = 1.0
            pose_pack = jnp.asarray(pose_pack)
        else:
            prev_state = carry["out"]["state"]
            prev_img = carry["imgs_dev"][-1]
            pose_pack = carry["out"]["pose_carry"]

        out = tracked_window_step(
            imgs_dev,
            prev_img,
            prev_state,
            mvk_stack,
            pose_pack,
            snap.fused,
            tr._intr,
            tr._pnp_key,
            jnp.asarray(self._dist_pack),
            n_mvs=n_mvs,
            reproj_err=float(self.settings.reprojection_error),
            threshold=float(self.extractor.threshold),
            coverage_threshold=float(self.extractor.coverage_threshold),
            imgs_right=imgs_right,
            patch_tri=patch_tri,
            patch_mp=patch_mp,
            patch_meta=patch_meta,
            mtri=mtri,
            mba=mba,
            capacity=self.extractor.capacity,
            max_cov=512,
            has_dist=self._has_dist,
            has_stereo=stereo,
        )
        if prof is not None:
            prof["disp_jit_call"] += _t() - t0
            t0 = _t()
        tr._pnp_key = out["key"]
        # Prefetch the result wire at DISPATCH time: copy_to_host_async is
        # non-blocking even while the computation is in flight (the D2H copy
        # chains onto compute completion), so the transfer rides the window
        # of host work between dispatch and replay and the blocking pull in
        # _replay_window finds the bytes already host-resident (measured:
        # 44 ms -> sub-ms on the tunneled link).
        try:
            out["wire"].copy_to_host_async()
        except AttributeError:
            pass
        # The carry for any subsequent dispatch is this window's device
        # output — whether that dispatch is speculative (pipelined) or the
        # per-frame path after a clean replay.
        self._prev_state = out["state"]
        self._prev_img = imgs_dev[-1]
        self.extractor._next_id_dev = out["state"].next_id
        # Simulated scheduler state at this window's exit (image counter,
        # mapper cooldown, last-KF id): lets a speculative next window be
        # KF-aligned before this one has replayed.
        if carry is None:
            start = self.image_count
            cool = self.mapper.cooldown
            lastkf = tr.last_kf_frame_id
        else:
            start, cool, lastkf = carry["sched_exit"]
        _, cool_x, lastkf_x = self._sim_kf_schedule(start, cool, lastkf, len(run))
        if prof is not None:
            prof["disp_tail"] += _t() - t0
        return {
            "out": out, "run": run, "snap": snap, "imgs_dev": imgs_dev,
            "stereo": stereo, "n_mvs": n_mvs,
            "patch_job": patch_job, "fused_job": staged,
            "n_base": len(snap.mps),
            "sched_exit": (start + len(run), cool_x, lastkf_x),
        }

    def _replay_window(self, wf, wire_np=None):
        """Pull one in-flight window's result wire (the single host<->device
        sync point) and replay it through the Tracking state machine.
        wire_np: the wire already pulled by the caller (the pipelined drive
        pulls before dispatching the next window so the pull isn't queued
        behind that window's uploads on the serial tunnel channel).
        Returns (poses, consumed, clean): clean=True iff every frame was
        consumed with tracking still OK — i.e. a window speculatively
        chained on this one's device carry is valid."""
        from ..ops.frame_step import N_SCALARS, packed_cols, unpack_bits_np
        from .trackstate import TrackState

        prof = self._prof
        _t = time.perf_counter
        t0 = time.perf_counter()
        out, run, snap, stereo = wf["out"], wf["run"], wf["snap"], wf["stereo"]
        imgs_dev = wf["imgs_dev"]
        W = len(run)
        tr = self.tracking

        # The window tracked against base + device patch (pending deferred
        # mapper results, or the window-FUSED mapper job whose result rides
        # this very wire). Make sure that job reached the host graph (the
        # fused one commits here, from the wire's trailing mapper section;
        # a standalone one normally landed at the keyframe processed between
        # this window's dispatch and now, with the poke covering
        # keyframe-less gaps) and extend the snapshot's host view so patched
        # rows resolve to MapPoints.
        if wire_np is None:
            wire_np = np.asarray(out["wire"])  # the ONE pull
        fused_job = wf.get("fused_job")
        if fused_job is not None and not fused_job.get("committed"):
            from ..ops.mapper_step import MAPPER_SMALL, split_mapper_wire

            sz = MAPPER_SMALL
            mlen = (
                sz["C"] * 3 + sz["K"] * 12 + sz["P"] * 3 + sz["O"] * 2
            )
            X, out_kf, out_mp, out_obs = split_mapper_wire(
                np.ascontiguousarray(wire_np[-mlen:]).view(np.float32),
                C=sz["C"], K=sz["K"], P=sz["P"], O=sz["O"],
            )
            self.mapper.commit_fused(fused_job, X, out_kf, out_mp, out_obs)
        patch_job = fused_job if fused_job is not None else wf.get("patch_job")
        if patch_job is not None:
            from ..ops.mapper_step import C_PATCH
            from .snapshot import MapSnapshot

            if not patch_job.get("committed"):
                self.mapper.poke_commit(blocking=True)
            tri = patch_job.get("tri")
            created = tri.get("created", {}) if tri is not None else {}
            ext = [created.get(i) for i in range(C_PATCH)]
            obs_ext = np.fromiter(
                (mp is not None and not mp.bad for mp in ext), bool, C_PATCH
            )
            snap.flush_stats()
            snap = MapSnapshot(
                snap.fused,
                mps=list(snap.mps) + ext,
                version=snap.version,
                obs_pos=np.concatenate([snap.obs_pos, obs_ext]),
            )

        C = packed_cols(self._has_dist, stereo)
        wire = wire_np
        if prof is not None:
            prof["rep_wire_pull"] += _t() - t0
        N = self.extractor.capacity
        P = snap.fused.shape[0]
        o1 = W * N * C
        o2 = o1 + W * N_SCALARS
        o3 = o2 + W * (P // 32)
        packed_w = wire[:o1].reshape(W, N, C)
        scal_w = wire[o1:o2].reshape(W, N_SCALARS)
        visbits_w = wire[o2:o3].reshape(W, P // 32)
        # No descriptors on the wire: keyframes archive theirs LAZILY from
        # the device-resident desc_w side channel (async copy kicked off at
        # the KF replay below; materialized only if a consumer — checkpoint
        # save, EXPRESS revalidation — actually reads them). The fused
        # mapper section trails the visibility bits (consumed above).

        if prof is not None:
            prof["rep_pre"] += _t() - t0
        poses = []
        consumed = 0
        rewound = False
        t_it = _t()
        for k in range(W):
            if prof is not None:
                prof["rep_loop_tail"] += _t() - t_it
                t_it = _t()
            ts, smv = run[k][0], run[k][1]
            scal = scal_w[k]
            t1 = _t()
            frame = Frame.from_packed(
                packed_w[k], timestamp=ts, image=smv.im_gray,
                fid=self.image_count, has_dist=self._has_dist, stereo=stereo,
            )
            if prof is not None:
                prof["rep_from_packed"] += _t() - t1
            pose = np.ascontiguousarray(scal[0:12]).view(np.float32)
            host_out = {
                "R": pose[0:9].reshape(3, 3).astype(np.float64),
                "t": pose[9:12].astype(np.float64),
                "n_ref_inliers": int(scal[12]),
                "n_inliers": int(scal[13]),
                "ok": scal[14] > 0,
                "snap_visible": unpack_bits_np(visbits_w[k], P),
            }
            if prof is not None:
                prof["rep_hostout"] += _t() - t_it
            t1 = _t()
            tr.track_fused(frame, host_out, snap)
            if prof is not None:
                prof["rep_track_fused"] += _t() - t1
                t_it = _t()
            self.mapper.tick()
            self.image_count += 1
            consumed = k + 1
            if tr.current is not None and tr.current.pose_set:
                poses.append((tr.current.R, tr.current.t))
            else:
                poses.append(None)
            if self.viewer is not None and tr.current is not None:
                self.viewer.update(tr.current, smv)
            if tr.state != State.OK:
                break
            # A keyframe created at this frame changes the map (new points,
            # new reference KF): the rest of the window was tracked against
            # a now-stale snapshot. When the upcoming frames are HEALTHY
            # (next frame's local-map inliers comfortably above the 30 gate)
            # we keep consuming — intra-window staleness is bounded by W
            # frames, and the reference's own mapper-thread latency delays
            # new points similarly. Only rewind (re-dispatch the remainder
            # against a fresh snapshot) when the margin is thin.
            if tr.last_kf_frame_id == frame.id:
                # Descriptors: archive LAZILY from the device-resident
                # desc_w side channel, materialized only if a consumer
                # (checkpoint save) reads them. Keeping descriptors off the
                # result wire saves 32 KB/window (~15% of the pull) on the
                # scarce D2H link. Even the SLICE desc_w[k] is deferred
                # into the thunk: eager slicing is a device dispatch that
                # measured 2.8 ms/frame of replay-critical-path RTT on the
                # tunnel.
                t2 = _t()
                kf = tr.last_kf
                if kf is not None and len(frame.cap_rows):
                    dw, rows = out["desc_w"], frame.cap_rows
                    kf.set_desc_thunk(
                        lambda d=dw, i=k, r=rows: np.asarray(d[i])[r]
                    )
                if prof is not None:
                    prof["rep_kf_desc"] += _t() - t2
                    prof["n_kf_last" if k == W - 1 else "n_kf_mid"] += 1
                    prof[f"kf_at_{k}_of_{W}"] += 1
                # Stereo and young maps always rewind (stale-snapshot frames
                # measurably degrade the gauge while it is still forming).
                # Mature mono keeps consuming: windows are KF-ALIGNED
                # (_collect_run sizes them so the KF is the last frame), so a
                # mid-window KF only happens after a schedule miss — then the
                # stale remainder is tolerated unless the very next frame is
                # already at the loss gate (30 local-map inliers,
                # Tracking.cc:930), where a fresh snapshot is the difference
                # between tracking and losing the map.
                # Staleness tolerance is map-maturity-dependent: young maps
                # (and the frames right after their keyframes) sit close to
                # the 30-inlier loss gate, so a thin post-KF margin rewinds;
                # mature maps tolerate intra-window staleness down to a
                # slimmer margin (rewinds cost ~2 RTTs each).
                n_kfs_ = self.atlas.current.n_keyframes()
                th_margin = 40 if n_kfs_ < 12 else 33
                if k + 1 < W and (
                    stereo
                    or n_kfs_ < 10
                    or int(scal_w[k + 1, 13]) < th_margin
                ):
                    rewound = True
                    break
            elif (
                k + 1 < W
                and 15 < int(scal[13])
                < (40 if self.atlas.current.n_keyframes() < 12 else 33)
                and self.mapper.cooldown > 1
                and frame.id >= tr.last_kf_frame_id + 3
            ):
                # Thin local-map margin (gate is 30 inliers, Tracking.cc:930)
                # with the next keyframe still frames away: the reference's
                # mapper inserts KFs whenever idle (mMinFrames=0,
                # Tracking.cc:137), so it would replenish the map NOW. Break
                # the window, expire the cooldown so the next replayed frame
                # keyframes immediately, and re-dispatch the remainder
                # against the refreshed snapshot. Costs one dispatch cycle,
                # only when margins are thin — the deterministic 8-frame KF
                # cadence otherwise lets decaying tracks cross the loss gate
                # mid-window.
                self.mapper.cooldown = 0
                rewound = True
                break

        if prof is not None:
            prof["rep_loop_tail"] += _t() - t_it
        if patch_job is not None:
            # The extended view is window-local: land its visible/found
            # accumulators on the MapPoint objects before it goes away.
            snap.flush_stats()
        clean = consumed == W and tr.state == State.OK and not rewound
        if not clean:
            # Rewind the device track state to the last consumed frame —
            # rebuilt ON DEVICE from the packed/desc side channels.
            k = consumed - 1
            next_id = int(scal_w[k, 15])  # i32 wire: the counter is direct
            self._prev_state = TrackState.rebuild(
                out["packed_w"][k], out["desc_w"][k], next_id
            )
            self._prev_img = imgs_dev[k]
            self.extractor._next_id_dev = self._prev_state.next_id

        dt = time.perf_counter() - t0
        self.track_ms.extend([1e3 * dt / max(consumed, 1)] * consumed)
        return poses, consumed, clean

    def track_monocular(self, timestamp, smv: MotionVectorImage, imu=None):
        """System::TrackMonocular (System.cc:171-234). Returns (R, t) of the
        current camera-from-world pose or None while initializing/lost.

        imu: optional (N, 7) array of IMU samples [dt gx gy gz ax ay az]
        covering the interval since the previous frame (IMU_MONOCULAR
        sensor)."""
        assert self.sensor in (MONOCULAR, IMU_MONOCULAR), "sensor not Monocular"
        self._flush_windows()
        if self.imu_buffer is not None and imu is not None:
            self.imu_buffer.add(self.image_count, imu)
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
            frame = Frame(state, timestamp=timestamp, image=smv.im_gray,
                          fid=self.image_count, camera=self.settings.camera1)
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

    def track_stereo_batch(self, items, flush=True):
        """Track a batch of (timestamp, smv_left, smv_right) triples through
        the windowed stereo program when eligible (mirrors
        track_monocular_batch, including the pipelined drive; stereo depth is
        computed on device inside the same dispatch, ops/frame_step 1c)."""
        if self.settings.need_rectify:
            from .stereo_rectified import rectify_pair

            items = [
                (it[0], *rectify_pair(it[1], it[2], self.settings))
                for it in items
            ]
        return self._batch_drive(items, flush, per_frame=self.track_stereo)

    def track_stereo(self, timestamp, smv, smv_right):
        """System::TrackStereo (System.cc:236-300)."""
        assert self.sensor == STEREO, "sensor not set to Stereo"
        self._flush_windows()
        if self.settings.need_rectify:
            from .stereo_rectified import rectify_pair

            smv, smv_right = rectify_pair(smv, smv_right, self.settings)
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
        frame = Frame(state, timestamp=timestamp, image=smv.im_gray,
                      fid=self.image_count, camera=self.settings.camera1)
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
    def activate_localization_mode(self):
        """System::ActivateLocalizationMode (System.h:118-121,
        System.cc:171-234 mode gates): freeze mapping and track against the
        frozen map — no keyframes, no triangulation, no BA, no new-map
        recovery. The Viewer menu exposes the same toggle in the reference
        (Viewer.cc:187)."""
        self._flush_windows()
        self.mapper.spin(final=True)  # land in-flight mapper work first
        self.mapper.dispatch_staged_async()
        self.mapper.poke_commit(blocking=True)
        self.tracking.only_tracking = True

    def deactivate_localization_mode(self):
        """System::DeactivateLocalizationMode: resume mapping."""
        self._flush_windows()
        self.tracking.only_tracking = False

    def localization_mode_active(self):
        return self.tracking.only_tracking

    def reset_active_map(self):
        Verbose.log("SYSTEM-> Resetting active map")
        self.tracking.reset_active_map()
        self._reset_requested = True

    def global_bundle_adjustment(self, iters=20, mesh=None):
        """Full-map BA over the active map (System::GlobalBundleAdjustment,
        System.cc:162-169): every keyframe optimized (origin fixed),
        synchronous writeback under the map lock.

        mesh: optional jax.sharding.Mesh — shards the Schur reduction over
        the mesh's "data" axis (parallel/gba.py: per-device point shards,
        one psum of the reduced camera system over ICI). Single-chip and
        sharded runs agree to solver tolerance (tests/test_gba_sharded.py)."""
        self.mapper.spin(final=True)  # drain queue + commit pending LBA first
        if mesh is not None:
            from ..parallel.gba import global_bundle_adjustment_sharded

            global_bundle_adjustment_sharded(
                self.atlas.current, self.mapper.camera, mesh,
                bf=self.mapper.bf, iters=iters,
                map_lock=self.mapper.map_lock,
            )
            return
        from .local_mapping import global_bundle_adjustment

        global_bundle_adjustment(
            self.atlas.current, self.mapper.camera, bf=self.mapper.bf,
            iters=iters, map_lock=self.mapper.map_lock,
        )

    def _flush_windows(self):
        """Drain the pipelined drive's in-flight windows (if any): replay
        them and push any rewound remainder through the per-frame paths.
        Called defensively at every per-frame entry point and at shutdown so
        mixed batch/per-frame usage and flush=False streams stay
        consistent."""
        while self._wfq:
            wf = self._wfq.pop(0)
            _, consumed, clean = self._replay_window(wf)
            refeed = list(wf["run"][consumed:])
            if not clean:
                for w2 in self._wfq:
                    self.mapper.restage(w2.get("fused_job"))
                    refeed.extend(w2["run"])
                self._wfq.clear()
            for it in refeed:
                if len(it) == 3:
                    self.track_stereo(*it)
                else:
                    self.track_monocular(*it)
        if self._pending:
            pend, self._pending = self._pending, []
            for it in pend:
                if len(it) == 3:
                    self.track_stereo(*it)
                else:
                    self.track_monocular(*it)

    def shutdown(self):
        self._flush_windows()
        if self._snapshot is not None:
            self._snapshot.flush_stats()
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

    def frame_trajectory(self):
        """Per-frame (ts, R_cw, t_cw, lost) tuples reconstructed against the
        bundle-adjusted keyframe poses — what the trajectory savers write and
        what evaluation should score (reference semantics, System.cc:458-720).
        Live track_monocular return values carry pre-BA early-map gauge error
        that this reconstruction retroactively removes."""
        return list(traj.frame_trajectory(self.tracking))

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
