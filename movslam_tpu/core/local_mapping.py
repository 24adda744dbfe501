"""LocalMapping: keyframe processing, point culling, triangulation, fusion,
and local bundle adjustment.

Mirrors the mapper thread of the reference
(/root/reference/src/LocalMapping.cc:50-115): process new KF -> cull recent
points -> create new points -> fuse with neighbors -> local BA. Runs
synchronously by default (deterministic, testable) or in a background thread
(System spawns it like System.cc:129); either way all heavy math — batched
triangulation of every candidate pair at once, the Schur-LM bundle
adjustment — executes as fixed-shape device programs.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.ba import ba_solve, ba_solve_packed, ba_solve_wire, build_obs_by_point
from ..ops.triangulate import triangulate, triangulate_pairs_padded
from .map import KeyFrame, MapPoint, update_normals_batch
from .matcher import fuse, search_for_triangulation
import threading
import time as _time

# LBA capacities (padded; one compile). Local KFs beyond the cap are dropped
# by covisibility weight — the reference has no cap but covis threshold 15
# keeps its sets comparable.
MAX_OPT_KF = 24
MAX_FIX_KF = 24
MAX_BA_MP = 2048
MAX_BA_OBS = 16384
MOPP = 16
CHI2_PRUNE = 5.0  # Optimizer.cc delta
REPROJ_TRI = 5.0  # CreateNewMapPoints reprojection gate (delta)


def _bucket(n, lo, hi):
    b = lo
    while b < n and b < hi:
        b *= 2
    return b


def assemble_ba_problem(kfs, n_opt, mps, init_kf_id, K, mopp=MOPP,
                        p_lo=512, p_hi=MAX_BA_MP, o_lo=2048, o_hi=MAX_BA_OBS):
    """Pack a BA problem (any KF/point subset) into the fixed-shape arrays
    `ba_solve_packed` consumes. kfs[:n_opt] are optimized (except the init
    KF, held fixed like g2o setFixed at Optimizer.cc:561); kfs[n_opt:] are
    fixed anchors. Returns None when the problem is empty.

    Observation capping: per point keep the `mopp` chronologically earliest
    keyframes (widest baselines), then a point-major total cap so complete
    points survive truncation.
    """
    if not kfs or not mps:
        return None
    mps = mps[:p_hi]
    P = _bucket(len(mps), p_lo, p_hi)

    kf_R = np.zeros((K, 3, 3), np.float32)
    kf_R[:, 0, 0] = kf_R[:, 1, 1] = kf_R[:, 2, 2] = 1.0
    kf_t = np.zeros((K, 3), np.float32)
    kf_fixed = np.ones(K, bool)
    kf_valid = np.zeros(K, bool)
    for i, kf in enumerate(kfs):
        kf_R[i] = kf.R
        kf_t[i] = kf.t
        kf_valid[i] = True
        kf_fixed[i] = (i >= n_opt) or (kf.id == init_kf_id)

    mp_pos = np.zeros((P, 3), np.float32)
    mp_valid = np.zeros(P, bool)
    for j, mp in enumerate(mps):
        mp_pos[j] = mp.pos
        mp_valid[j] = True

    # --- vectorized observation assembly (the per-KF slot arrays are the
    # ground truth; no per-observation Python loops) -----------------
    mp_id_arr = np.fromiter((mp.id for mp in mps), np.int64, len(mps))
    sort_perm = np.argsort(mp_id_arr)
    sorted_ids = mp_id_arr[sort_perm]

    def lookup(mids):
        """Vectorized id -> local index (-1 if absent)."""
        pos = np.searchsorted(sorted_ids, mids)
        pos_c = np.minimum(pos, len(sorted_ids) - 1)
        ok = sorted_ids[pos_c] == mids
        return np.where(ok, sort_perm[pos_c], -1)

    blocks = []  # (kf_idx arr, mp_idx arr, uv arr, ur arr, slot arr)
    for i, kf in enumerate(kfs):
        slots = np.flatnonzero(kf.mp_ids >= 0)
        if len(slots) == 0:
            continue
        mids = kf.mp_ids[slots]
        j_idx = lookup(mids)
        keep = j_idx >= 0
        slots = slots[keep]
        j_idx = j_idx[keep]
        uv = kf.pts[slots]
        if kf.uright is not None:
            ur = np.where(kf.uright[slots] >= 0, kf.uright[slots], -1.0)
        else:
            ur = np.full(len(slots), -1.0)
        blocks.append(
            (np.full(len(slots), i, np.int32), j_idx.astype(np.int32),
             uv.astype(np.float32), ur.astype(np.float32),
             slots.astype(np.int32))
        )
    if not blocks:
        return None
    all_kf = np.concatenate([b[0] for b in blocks])
    all_mp = np.concatenate([b[1] for b in blocks])
    all_uv = np.concatenate([b[2] for b in blocks])
    all_ur = np.concatenate([b[3] for b in blocks])
    all_slot = np.concatenate([b[4] for b in blocks])

    all_kfid = np.concatenate(
        [np.full(len(b[0]), kfs[int(b[0][0])].id, np.int64) for b in blocks]
    )
    order = np.lexsort((all_kfid, all_mp))
    mp_sorted = all_mp[order]
    first = np.concatenate([[True], mp_sorted[1:] != mp_sorted[:-1]])
    group_start = np.maximum.accumulate(np.where(first, np.arange(len(order)), 0))
    within = np.arange(len(order)) - group_start
    keep_sorted = within < mopp
    sel = order[keep_sorted][:o_hi]

    n_obs = len(sel)
    O = _bucket(n_obs, o_lo, o_hi)
    sel = sel[:O]
    n_obs = len(sel)
    obs_kf = np.zeros(O, np.int32)
    obs_mp = np.zeros(O, np.int32)
    obs_uv = np.zeros((O, 2), np.float32)
    obs_ur = np.full(O, -1.0, np.float32)
    obs_valid = np.zeros(O, bool)
    obs_kf[:n_obs] = all_kf[sel]
    obs_mp[:n_obs] = all_mp[sel]
    obs_uv[:n_obs] = all_uv[sel]
    obs_ur[:n_obs] = all_ur[sel]
    obs_valid[:n_obs] = True
    obs_meta = (all_kf[sel], all_mp[sel], all_slot[sel])

    obp = build_obs_by_point(np.where(obs_valid, obs_mp, P), P, mopp, O)

    kf_pack = np.zeros((K, 14), np.float32)
    kf_pack[:, 0:9] = kf_R.reshape(K, 9)
    kf_pack[:, 9:12] = kf_t
    kf_pack[:, 12] = kf_fixed
    kf_pack[:, 13] = kf_valid
    mp_pack = np.zeros((P, 4), np.float32)
    mp_pack[:, 0:3] = mp_pos
    mp_pack[:, 3] = mp_valid
    obs_pack = np.zeros((O, 6), np.float32)
    obs_pack[:, 0] = obs_kf
    obs_pack[:, 1] = obs_mp
    obs_pack[:, 2:4] = obs_uv
    obs_pack[:, 4] = obs_ur
    obs_pack[:, 5] = obs_valid
    return {
        "kf_pack": kf_pack, "mp_pack": mp_pack, "obs_pack": obs_pack,
        "obp": obp, "obs_meta": obs_meta, "kf_fixed": kf_fixed, "mps": mps,
    }


def problem_wire(prob):
    """Flatten an assembled BA problem into the single-upload wire layout of
    ops.ba.ba_solve_wire. Returns (wire f32, (K, P, O, MOPP))."""
    kf_pack, mp_pack = prob["kf_pack"], prob["mp_pack"]
    obs_pack, obp = prob["obs_pack"], prob["obp"]
    wire = np.concatenate(
        [
            kf_pack.reshape(-1), mp_pack.reshape(-1),
            obs_pack.reshape(-1), obp.reshape(-1).astype(np.float32),
        ]
    )
    return wire, (kf_pack.shape[0], mp_pack.shape[0], obs_pack.shape[0], obp.shape[1])


def split_ba_wire(out, K, P, O):
    """Split ba_solve_wire's flat result back into (out_kf, out_mp, out_obs)."""
    out = np.asarray(out)
    o0 = K * 12
    o1 = o0 + P * 3
    return (
        out[:o0].reshape(K, 12),
        out[o0:o1].reshape(P, 3),
        out[o1:].reshape(O, 2),
    )


def commit_ba_result(res, obs_meta, kfs, mps, kf_fixed, m):
    """Prune chi2>5 / negative-depth observations and write optimized
    poses/points back into the map graph (Optimizer.cc:761-841). Caller
    holds the map lock."""
    out_kf, out_mp, out_obs = res
    out_kf = np.asarray(out_kf)
    out_mp = np.asarray(out_mp)
    out_obs = np.asarray(out_obs)
    chi2 = out_obs[:, 0]
    depth = out_obs[:, 1]
    R_out = out_kf[:, 0:9].reshape(-1, 3, 3).astype(np.float64)
    t_out = out_kf[:, 9:12].astype(np.float64)
    X_out = out_mp.astype(np.float64)

    o_kf, o_mp, o_slot = obs_meta
    bad_o = np.flatnonzero(
        (chi2[: len(o_kf)] > CHI2_PRUNE) | (depth[: len(o_kf)] <= 0)
    )
    for o in bad_o:
        mp = mps[o_mp[o]]
        if mp.bad or mp.replaced_by is not None:
            continue
        kf = kfs[o_kf[o]]
        # The solve ran asynchronously: fusion/replacement may have re-pointed
        # this slot to a different point since dispatch — only sever the
        # association the solve actually judged.
        if kf.mp_ids[int(o_slot[o])] != mp.id:
            continue
        kf.erase_mappoint_slot(int(o_slot[o]))
        mp.remove_observation(kf.id)

    for i, kf in enumerate(kfs):
        if not kf_fixed[i] and not kf.bad:
            kf.set_pose(R_out[i], t_out[i])
    alive = []
    for j, mp in enumerate(mps):
        # Skip points replaced since dispatch: their optimized position was
        # computed against poses that no longer own them.
        if not mp.bad and mp.replaced_by is None:
            mp.pos = X_out[j]
            alive.append(mp)
    update_normals_batch(alive, m)
    m.bump_change()


# Global-BA capacities: bucketed keyframe counts (one compile per bucket)
# and larger point/observation caps than local BA. The dense Schur system at
# K=512 is a 3072x3072 solve — comfortable MXU territory.
GBA_KF_BUCKETS = (48, 96, 192, 384, 512)
GBA_MAX_MP = 16384
GBA_MAX_OBS = 65536


def global_bundle_adjustment(m, camera, bf=0.0, iters=20, map_lock=None):
    """Full-map bundle adjustment (Optimizer::BundleAdjustment /
    System::GlobalBundleAdjustment, Optimizer.cc:61-395 + System.cc:162-169):
    EVERY good keyframe optimized (origin fixed), every good map point, 20 LM
    iterations, synchronous writeback. Keyframe count is bucketed (a handful
    of compiled shapes); maps beyond the largest bucket run in overlapping
    windows so every keyframe still gets optimized (each window anchored by
    the keyframes shared with the previous one)."""
    from .verbose import Verbose

    kfs = sorted(
        (kf for kf in m.keyframes.values() if not kf.bad), key=lambda k: k.id
    )
    if not kfs:
        return
    max_kf = GBA_KF_BUCKETS[-1]
    if len(kfs) <= max_kf:
        windows = [(kfs, 0)]  # (kf list, number of leading fixed anchors)
    else:
        # Overlapping windows: each subsequent window holds `overlap` already
        # -optimized keyframes fixed as gauge anchors. Overlap is bounded to
        # half the window so the step stays positive for small buckets.
        overlap = min(64, max_kf // 2)
        step = max_kf - overlap
        windows = [(kfs[:max_kf], 0)]
        i = step
        while i + overlap < len(kfs):
            windows.append((kfs[i : i + max_kf], overlap))
            i += step
        Verbose.log(
            f"GlobalBA: {len(kfs)} keyframes -> {len(windows)} overlapping "
            f"windows of <= {max_kf}"
        )

    for w_kfs, n_anchor in windows:
        _gba_window(m, camera, w_kfs, n_anchor, bf, iters, map_lock)


def _gba_window(m, camera, kfs, n_anchor, bf, iters, map_lock):
    """One global-BA window: kfs[:n_anchor] fixed (gauge anchors from the
    previous window; 0 for the first window where the init/first KF anchors),
    everything else optimized."""
    from .verbose import Verbose

    K = _bucket(len(kfs), GBA_KF_BUCKETS[0], GBA_KF_BUCKETS[-1])
    kf_ids = {kf.id for kf in kfs}
    mps = []
    seen = set()
    for kf in kfs:
        for mid in kf.mp_ids:
            if mid >= 0 and mid not in seen:
                seen.add(int(mid))
                mp = m.mappoints.get(int(mid))
                if mp is not None and not mp.bad:
                    mps.append(mp)
    if len(mps) > GBA_MAX_MP:
        Verbose.log(
            f"GlobalBA: truncating {len(mps)} map points to {GBA_MAX_MP}"
        )
        mps = mps[:GBA_MAX_MP]

    # Gauge: the init KF when present, else the window's first KF (ADVICE
    # round-1: a truncated window without the init KF was gauge-free).
    anchor_id = m.init_kf_id if m.init_kf_id in kf_ids else kfs[0].id
    # Order so fixed anchors land in the tail (assemble fixes kfs[n_opt:]).
    opt_kfs = [kf for kf in kfs[n_anchor:]]
    fix_kfs = [kf for kf in kfs[:n_anchor]]
    ordered = opt_kfs + fix_kfs
    prob = assemble_ba_problem(
        ordered, len(opt_kfs), mps, anchor_id, K,
        p_lo=512, p_hi=GBA_MAX_MP, o_lo=2048, o_hi=GBA_MAX_OBS,
    )
    if prob is None:
        return
    wire, (Kw, Pw, Ow, MOPPw) = problem_wire(prob)
    res_wire = ba_solve_wire(
        jnp.asarray(wire),
        jnp.asarray([camera.fx, camera.fy, camera.cx, camera.cy], jnp.float32),
        bf, K=Kw, P=Pw, O=Ow, MOPP=MOPPw, iters=iters,
    )
    res = split_ba_wire(res_wire, Kw, Pw, Ow)
    if map_lock is not None:
        map_lock.acquire()
    try:
        commit_ba_result(
            res, prob["obs_meta"], ordered, prob["mps"], prob["kf_fixed"], m
        )
    finally:
        if map_lock is not None:
            map_lock.release()


class LocalMapping:
    def __init__(self, atlas, camera, monocular=True, far_points=0.0, bf=0.0, stereo_b=0.0):
        self.atlas = atlas
        self.camera = camera
        self.monocular = monocular
        self.bf = float(bf)
        self.stereo_b = float(stereo_b)
        self.far_points = far_points > 0.0
        self.th_far_points = far_points
        self.recent_points = []
        self.current_kf = None
        self.accept_keyframes = True
        self.queue = []
        self.abort_ba = False
        self.lba_count = 0
        self.lba_ms = []
        # Emulated thread backpressure: the reference's mapper is busy for
        # roughly 1-3 frame times per keyframe (AcceptKeyFrames(false) during
        # processing, LocalMapping.cc:57,106), which throttles keyframe
        # cadence and lets recent map points accumulate observations before
        # the culling gate. cooldown counts frames until idle again.
        self.cooldown = 0
        self.busy_frames = 0  # 0 = keyframe whenever the mapper is idle (fast-mapper behavior)
        # Throttle mode: "latency" polls the pending async BA's readiness
        # (wall-clock adaptive — right for the per-frame real-time drive);
        # "frames" uses the busy_frames cooldown only (deterministic — right
        # for the windowed drive, where W frames replay in microseconds and a
        # wall-clock poll would starve keyframe creation for whole windows).
        self.throttle_mode = "latency"
        # Threaded mode (reference LocalMapping thread, System.cc:129):
        # Tracking and the mapper share map_lock (the reference's
        # mMutexMapUpdate, Map.h:137); device waits happen outside it.
        self.map_lock = threading.RLock()
        self._thread = None
        self._finish = False
        self._processing = False
        self.enable_merge = True
        # Redundant-keyframe culling (see _keyframe_culling): bounds map
        # growth on long runs.
        self.enable_kf_culling = True
        self.n_culled_kfs = 0
        # Visual-inertial hook (core/inertial.py): set by System when the
        # sensor is IMU_MONOCULAR. The reference's equivalent —
        # LocalMapping::ScaleRefinement -> InertialOptimization — is never
        # called there (LocalMapping.cc:804-857).
        self.imu_buffer = None
        self.imu_noise = (1.7e-4, 2e-3)
        self.vi_min_kfs = 6
        # Deferred two-phase mapping (the windowed drive's mapper mode):
        # keyframe n's triangulation + local BA run as ONE fused device
        # program (ops/mapper_step) dispatched at KF n and pulled/committed
        # at KF n+1, so the solve overlaps the tracking of the frames in
        # between and the pull costs only the RTT. Young maps (< defer_min_kfs
        # keyframes) stay synchronous: they need fresh points immediately.
        self.defer_mapping = False
        self.defer_min_kfs = 8
        self._deferred = None
        # Window-fused mapping (the windowed drive's steady-state mode): a
        # SMALL-class mapper job is STAGED as host wires instead of being
        # dispatched standalone; the next window dispatch inlines it into the
        # window program (ops/window_step mtri/mba inputs) so its uploads,
        # compute, patch and result all ride the window's own transfers —
        # zero extra round trips on the serial tunnel link. Jobs no window
        # consumes fall back to the standalone dispatch at the next blocking
        # commit point.
        self.fuse_mapper = False
        self._staged = None
        # Live visual-inertial local BA (ops/vi_ba): once the map is
        # IMU-initialized, local BA jointly optimizes poses + velocities +
        # biases with preintegrated inertial edges along the temporal
        # keyframe chain — the LocalInertialBA the reference only defines
        # types for (G2oTypes.h:522-666).
        self.use_vi_ba = True

    # --- queue interface (Tracking -> mapper) ------------------------------
    def insert_keyframe(self, kf):
        self.queue.append(kf)
        self.abort_ba = True
        self.cooldown = self.busy_frames

    def tick(self):
        """Called once per tracked frame (the mapper's clock)."""
        if self.cooldown > 0:
            self.cooldown -= 1

    def is_idle(self):
        """AcceptKeyFrames (LocalMapping.cc): the reference's mapper thread
        reports busy while it processes a keyframe, which is what throttles
        NeedNewKeyFrame's c1b (Tracking.cc:969) between mMinFrames and
        mMaxFrames. Here keyframe processing is an async device dispatch, so
        'busy' = the local-BA result hasn't landed yet (jax.Array.is_ready()
        polls without blocking) — the KF rate adapts to real BA latency just
        like the reference's thread timing."""
        if len(self.queue) != 0 or self.cooldown != 0 or self._processing:
            return False
        if self.throttle_mode == "latency":
            pending = getattr(self, "_pending_ba", None)
            if pending is not None:
                try:
                    if not all(x.is_ready() for x in pending["res"]):
                        return False
                except AttributeError:
                    pass
        return True

    # --- threaded mode (reference LocalMapping::Run, LocalMapping.cc:50-115)
    def start_thread(self):
        if self._thread is not None:
            return
        self._finish = False
        self._thread = threading.Thread(target=self._run_loop, daemon=True)
        self._thread.start()

    def _run_loop(self):
        while not self._finish:
            if self.queue:
                self._processing = True
                try:
                    self.process_one()
                finally:
                    self._processing = False
            else:
                _time.sleep(0.0005)  # reference polls at 500 us

    def wait_idle(self, timeout=60.0):
        """Block until the mapper thread drains its queue (init barriers)."""
        t0 = _time.time()
        while (self.queue or self._processing) and _time.time() - t0 < timeout:
            _time.sleep(0.001)

    def stop_thread(self):
        if self._thread is None:
            return
        self._finish = True
        self._thread.join(timeout=30)
        self._thread = None
        self.spin(final=True)

    def spin(self, final=False):
        """Drain the queue inline. Safe in both modes: the pop and all graph
        mutation happen under the reentrant map lock, so the worker thread
        simply contends rather than double-popping. final=True also commits
        the in-flight BA."""
        while self.queue:
            self.process_one()
        if final:
            self._commit_pending_ba()
            self._commit_deferred()

    def process_one(self):
        # Commit the previous keyframe's device work first: it was launched
        # asynchronously and has been overlapping with tracking.
        self._commit_pending_ba()
        self._commit_deferred()
        # Redundant-keyframe culling runs HERE — after the previous cycle's
        # deferred device work landed (so no in-flight BA job references the
        # graph) and before the new keyframe mutates covisibility. One-cycle
        # lag vs the reference's post-LBA placement, same steady state.
        if (
            self.enable_kf_culling
            and self.current_kf is not None
            and not self.current_kf.bad
            and self.current_kf.map_id == self.atlas.current.id
        ):
            with self.map_lock:
                self._keyframe_culling(self.atlas.current, self.current_kf)
        with self.map_lock:
            if not self.queue:
                return
            kf = self.queue.pop(0)
            self.current_kf = kf
            m = self.atlas.current
            self._process_new_keyframe(kf, m)
            self._map_point_culling(m)
            deferred = self.defer_mapping and m.n_keyframes() >= self.defer_min_kfs
            if deferred:
                from ..ops.mapper_step import MAPPER_SMALL, TRI_CAP

                tri_job = self._prepare_triangulation(m, cap=TRI_CAP)
                tri_fits_small = (
                    tri_job is None
                    or len(tri_job["cand"]) <= MAPPER_SMALL["C"]
                )
                if not self.queue:
                    self._search_in_neighbors(m)
                ba_job = (
                    self._prepare_local_ba(m, small_ok=tri_fits_small)
                    if not self.queue and m.n_keyframes() > 2
                    else None
                )
            else:
                self._create_new_map_points(m)
                if not self.queue:
                    self._search_in_neighbors(m)
        if deferred:
            if tri_job is not None or ba_job is not None:
                t0 = _time.perf_counter()
                size = self._mapper_size_class(tri_job, ba_job)
                from ..ops.mapper_step import MAPPER_SMALL

                if self.fuse_mapper and size is MAPPER_SMALL:
                    # Stage for the next window dispatch (window-fused mode).
                    tri_w, ba_w = self._build_mapper_wires(
                        tri_job, ba_job, size
                    )
                    tri_w[0, 30] = 1.0  # in-program on/off flag
                    self._staged = {
                        "tri_wire": tri_w, "ba_wire": ba_w,
                        "tri": tri_job, "ba": ba_job, "map": m, "size": size,
                    }
                else:
                    self._dispatch_mapper_step(tri_job, ba_job, m)
                self.lba_ms.append(1e3 * (_time.perf_counter() - t0))
                self.lba_count += 1
        elif not self.queue and m.n_keyframes() > 2:
            t0 = _time.perf_counter()
            if (
                self.use_vi_ba
                and self.imu_buffer is not None
                and getattr(m, "imu_initialized", False)
            ):
                self._local_ba_vi(m)  # joint visual-inertial, sync commit
            else:
                self._local_ba(m)  # async dispatch; writeback at next commit
            self.lba_ms.append(1e3 * (_time.perf_counter() - t0))
            self.lba_count += 1

        # Visual-inertial gravity/scale initialization (the reference's
        # ScaleRefinement hook, completed): once enough keyframes carry IMU
        # evidence, solve gravity + metric scale + velocities + biases with
        # poses fixed, then re-express the map metric & gravity-aligned.
        # Staged refinement like ORB-SLAM3's repeated inertial inits: the
        # first solve sees a short weakly-exciting baseline; re-running at
        # 2x and 4x the keyframe count tightens scale and gravity.
        if self.imu_buffer is not None:
            stage = getattr(m, "imu_init_count", 0)
            if stage < 3 and m.n_keyframes() >= self.vi_min_kfs * (2 ** stage):
                from .inertial import visual_inertial_init

                self._commit_pending_ba()  # pre-scale BA must land first
                self._commit_deferred()
                with self.map_lock:
                    res = visual_inertial_init(
                        m, list(m.keyframes.values()), self.imu_buffer,
                        noise_gyro=self.imu_noise[0],
                        noise_acc=self.imu_noise[1],
                    )
                if res is not None:
                    m.imu_init_count = stage + 1

        # Multi-map welding: when tracking loss spawned a new map and enough
        # shared tracks exist, merge it back (Sim3 + pose-graph relaxation) —
        # the recovery completion the reference leaves undone (SURVEY.md §5).
        if (
            self.enable_merge
            and len(self.atlas.maps) > 1
            and m.n_keyframes() >= 5
            and m.n_keyframes() % 5 == 0
        ):
            from .map_merge import try_merge

            self._commit_deferred()
            with self.map_lock:
                self._commit_pending_ba()
                try_merge(self.atlas)

    # --- stages -----------------------------------------------------------
    def _keyframe_culling(self, m, kf):
        """Redundant-keyframe removal — LocalMapping::KeyFrameCulling is
        declared but never defined in the reference (LocalMapping.h:131);
        this implements the ORB-SLAM3 policy that declaration points at: a
        local keyframe is redundant when >=90% of its tracked map points are
        observed by at least 3 OTHER keyframes. Bounds keyframe growth on
        long runs (the reference's maps grow without bound), keeping the
        snapshot/LBA caps covering the live map instead of silently
        truncating. Culled keyframes keep a Tcp parent-chain record
        (KeyFrame.set_bad) so trajectory savers still emit every frame id."""
        protected = {kf.id}
        if kf.prev_kf is not None:
            protected.add(kf.prev_kf.id)
        for org in m.kf_origins:
            protected.add(org.id)
        inertial = getattr(m, "imu_initialized", False)
        for cand in kf.best_covisible(m, 30):
            if cand.id in protected or cand.bad:
                continue
            if inertial and cand.prev_kf is not None and cand.next_kf is not None:
                # Keep the preintegration chain dense enough (ORB-SLAM3's
                # 3 s gap guard for inertial maps).
                if cand.next_kf.timestamp - cand.prev_kf.timestamp > 3.0:
                    continue
            n_mps = 0
            n_red = 0
            for mid in cand.mp_ids:
                if mid < 0:
                    continue
                mp = m.mappoints.get(int(mid))
                if mp is None or mp.bad:
                    continue
                n_mps += 1
                if mp.n_obs() > 3:  # this KF + at least 3 others
                    n_red += 1
            if n_mps > 10 and n_red > 0.9 * n_mps:
                cand.set_bad(m)
                self.n_culled_kfs += 1

    def _process_new_keyframe(self, kf, m):
        """LocalMapping::ProcessNewKeyFrame (LocalMapping.cc:171-212)."""
        touched = []
        for slot, mid in enumerate(kf.mp_ids):
            if mid < 0:
                continue
            mp = m.mappoints.get(int(mid))
            if mp is None or mp.bad:
                kf.mp_ids[slot] = -1
                continue
            if kf.id not in mp.obs:
                mp.add_observation(kf, slot)
                touched.append(mp)
            else:
                # Can only happen for fresh stereo points from Tracking.
                self.recent_points.append(mp)
        update_normals_batch(touched, m)
        kf.update_connections(m)
        m.add_keyframe(kf)

    def _map_point_culling(self, m):
        """LocalMapping::MapPointCulling (LocalMapping.cc:117-156)."""
        th_obs = 2 if self.monocular else 3
        cur_id = self.current_kf.id
        keep = []
        for mp in self.recent_points:
            if mp.bad:
                continue
            if mp.found_ratio() < 0.25:
                mp.set_bad(m)
            elif cur_id - mp.first_kf_id >= 2 and mp.n_obs() <= th_obs:
                mp.set_bad(m)
            elif cur_id - mp.first_kf_id >= 3:
                pass  # graduated
            else:
                keep.append(mp)
        self.recent_points = keep

    def _create_new_map_points(self, m):
        """LocalMapping::CreateNewMapPoints (LocalMapping.cc:220-501) with all
        candidate pairs of all neighbors triangulated in ONE device batch."""
        job = self._prepare_triangulation(m)
        if job is None:
            return
        X = triangulate_pairs_padded(
            job["P1"], job["P2s"], job["uv1"], job["uv2"]
        ).astype(np.float64)
        return self._commit_triangulation(job, X, m)

    def _prepare_triangulation(self, m, cap=None):
        """Host half of CreateNewMapPoints: collect every candidate pair of
        every eligible covisible neighbor plus all pose-dependent gate inputs.
        Returns a job dict for _commit_triangulation (None when empty)."""
        kf1 = self.current_kf
        neighbors = kf1.best_covisible(m, 30)
        if not neighbors:
            return None
        cam = self.camera
        R1, t1 = kf1.pose()
        Ow1 = kf1.center()
        P1 = cam.K() @ np.concatenate([R1, t1.reshape(3, 1)], axis=1)

        cand = []  # (kf2, slot1, slot2)
        P2s = []
        for kf2 in neighbors:
            baseline = np.linalg.norm(kf2.center() - Ow1)
            if self.monocular:
                med = kf2.scene_median_depth(m)
                if med <= 0 or baseline / med < 0.01:
                    continue
            else:
                if baseline < self.stereo_b:
                    continue
            s1, s2 = search_for_triangulation(kf1, kf2)
            if len(s1) == 0:
                continue
            R2, t2 = kf2.pose()
            P2 = cam.K() @ np.concatenate([R2, t2.reshape(3, 1)], axis=1)
            for a, b in zip(s1, s2):
                cand.append((kf2, int(a), int(b)))
                P2s.append(P2)
        if not cand:
            return None

        # The device batch is padded to a fixed capacity; truncate the
        # candidate list to the same cap HERE so the per-candidate masks
        # stay aligned with the device result (no silent caps: log).
        if cap is None:
            from ..ops.triangulate import _PAIR_BUCKETS

            cap = _PAIR_BUCKETS[-1]
        if len(cand) > cap:
            from .verbose import Verbose

            Verbose.log(
                f"LocalMapping: truncating {len(cand)} triangulation "
                f"candidates to {cap}"
            )
            cand = cand[:cap]
            P2s = P2s[:cap]

        uv1 = np.stack([kf1.pts[a] for (_, a, _) in cand])
        uv2 = np.stack([kf2.pts[b] for (kf2, _, b) in cand])
        P2s = np.stack(P2s)
        return {
            "kf1": kf1, "cand": cand, "P1": P1, "P2s": P2s,
            "uv1": uv1, "uv2": uv2, "R1": R1, "t1": t1, "Ow1": Ow1,
        }

    def _commit_triangulation(self, job, X, m):
        """Gate triangulated candidates and create the surviving MapPoints
        (the back half of CreateNewMapPoints). X may come from the fused
        deferred mapper program (pulled one keyframe later) — the per-slot
        claim checks below re-validate against the current graph."""
        kf1 = job["kf1"]
        if kf1.bad:
            return 0
        cand = job["cand"]
        uv1, uv2 = job["uv1"], job["uv2"]
        R1, t1, Ow1 = job["R1"], job["t1"], job["Ow1"]
        cam = self.camera

        C = len(cand)
        X = np.asarray(X, np.float64)[:C]
        s1_arr = np.fromiter((a for (_, a, _) in cand), np.int64, C)
        s2_arr = np.fromiter((b for (_, _, b) in cand), np.int64, C)
        R2_arr = np.stack([kf2.R for (kf2, _, _) in cand])
        t2_arr = np.stack([kf2.t for (kf2, _, _) in cand])
        Ow2_arr = np.einsum("cij,cj->ci", -R2_arr.transpose(0, 2, 1), t2_arr)

        # Stereo mode: prefer stereo unprojection when the stereo parallax
        # beats the motion parallax (LocalMapping.cc:341-393) — low-baseline
        # mono triangulation of far points is depth-biased. Vectorized.
        if not self.monocular:
            z1s = (
                kf1.depth_right[s1_arr]
                if kf1.depth_right is not None
                else np.full(C, -1.0)
            )
            z2s = np.array(
                [
                    kf2.depth_right[b] if kf2.depth_right is not None else -1.0
                    for (kf2, _, b) in cand
                ]
            )
            cps1 = np.where(z1s > 0, np.cos(2 * np.arctan2(self.stereo_b / 2, z1s)), 2.0)
            cps2 = np.where(z2s > 0, np.cos(2 * np.arctan2(self.stereo_b / 2, z2s)), 2.0)
            use1 = (z1s > 0) & (cps1 <= cps2)
            use2 = (z2s > 0) & (cps2 < cps1) & ~use1
            pc1 = np.stack(
                [
                    (uv1[:, 0] - cam.cx) * z1s / cam.fx,
                    (uv1[:, 1] - cam.cy) * z1s / cam.fy,
                    z1s,
                ],
                axis=1,
            )
            X1 = (pc1 - kf1.t) @ kf1.R  # R^T (pc - t), row-wise
            pc2 = np.stack(
                [
                    (uv2[:, 0] - cam.cx) * z2s / cam.fx,
                    (uv2[:, 1] - cam.cy) * z2s / cam.fy,
                    z2s,
                ],
                axis=1,
            )
            X2 = np.einsum("cji,cj->ci", R2_arr, pc2 - t2_arr)
            X = np.where(use1[:, None], X1, np.where(use2[:, None], X2, X))

        # Per-candidate parallax gate: rays must subtend enough angle or the
        # triangulated depth is noise-dominated (the ORB-SLAM3 condition the
        # reference comments out at LocalMapping.cc:363; without it a
        # marginally-open baseline gate floods the map with far junk that
        # poisons PnP and BA).
        cam_ = cam
        r1c = np.stack(
            [
                (uv1[:, 0] - cam_.cx) / cam_.fx,
                (uv1[:, 1] - cam_.cy) / cam_.fy,
                np.ones(C),
            ],
            axis=1,
        )
        r2c = np.stack(
            [
                (uv2[:, 0] - cam_.cx) / cam_.fx,
                (uv2[:, 1] - cam_.cy) / cam_.fy,
                np.ones(C),
            ],
            axis=1,
        )
        ray1 = r1c @ R1  # R1^T r, row-wise (world frame)
        ray2 = np.einsum("cji,cj->ci", R2_arr, r2c)
        cos_par = np.einsum("ci,ci->c", ray1, ray2) / (
            np.linalg.norm(ray1, axis=1) * np.linalg.norm(ray2, axis=1) + 1e-12
        )
        parallax_ok = cos_par < 0.9998  # ~> 1.15 deg

        # Vectorized gates (depth, reprojection <= delta, distances, far).
        finite = np.isfinite(X).all(axis=1)
        z1 = X @ R1[2] + t1[2]
        pc2_all = np.einsum("cij,cj->ci", R2_arr, X) + t2_arr
        z2 = pc2_all[:, 2]
        pc1_all = X @ R1.T + t1
        with np.errstate(divide="ignore", invalid="ignore"):
            u1 = cam.fx * pc1_all[:, 0] / pc1_all[:, 2] + cam.cx
            v1 = cam.fy * pc1_all[:, 1] / pc1_all[:, 2] + cam.cy
            u2 = cam.fx * pc2_all[:, 0] / z2 + cam.cx
            v2 = cam.fy * pc2_all[:, 1] / z2 + cam.cy
        e1 = (u1 - uv1[:, 0]) ** 2 + (v1 - uv1[:, 1]) ** 2
        e2 = (u2 - uv2[:, 0]) ** 2 + (v2 - uv2[:, 1]) ** 2
        d1 = np.linalg.norm(X - Ow1, axis=1)
        d2 = np.linalg.norm(X - Ow2_arr, axis=1)
        good = (
            finite
            & parallax_ok
            & (z1 > 0) & (z2 > 0)
            & (e1 <= REPROJ_TRI) & (e2 <= REPROJ_TRI)
            & (d1 > 0) & (d2 > 0)
        )
        if self.far_points:
            good &= (d1 < self.th_far_points) & (d2 < self.th_far_points)

        created = 0
        new_mps = []
        # Candidate index -> created MapPoint: the windowed drive's replay
        # maps device-patched snapshot rows (n_base + i) back to the host
        # objects through this record (core/system._replay_window).
        created_map = {}
        # Map-level track-id dedup: with window-fused mapping, keyframe n's
        # job is PREPARED before keyframe n-1's result lands in the host
        # graph (it rides the next window's wire), so both jobs can carry the
        # same not-yet-mapped track. The per-slot claim checks below can't
        # see that — a second MapPoint on one track id would corrupt the
        # track-id join (snapshot searchsorted picks arbitrarily).
        live_tids = {
            mp.track_id for mp in m.mappoints.values() if not mp.bad
        }
        for i in np.flatnonzero(good):
            kf2, s1_, s2_ = cand[i]
            if kf1.mp_ids[s1_] >= 0 or kf2.mp_ids[s2_] >= 0:
                continue  # claimed by an earlier pair this round
            if int(kf2.track_ids[s2_]) in live_tids:
                continue  # mapped by a job committed since this one's prep
            live_tids.add(int(kf2.track_ids[s2_]))
            mp = MapPoint(X[i], kf1.id, int(kf2.track_ids[s2_]), m.id)
            mp.add_observation(kf1, int(s1_))
            mp.add_observation(kf2, int(s2_))
            kf1.add_mappoint(mp, int(s1_))
            kf2.add_mappoint(mp, int(s2_))
            m.add_mappoint(mp)
            self.recent_points.append(mp)
            new_mps.append(mp)
            created_map[int(i)] = mp
            created += 1
        update_normals_batch(new_mps, m)
        job["created"] = created_map
        return created

    def _search_in_neighbors(self, m):
        """LocalMapping::SearchInNeighbors (LocalMapping.cc:503-608): two-hop
        covisible fusion of duplicate map points."""
        kf1 = self.current_kf
        targets = []
        seen = {kf1.id}
        for kf2 in kf1.best_covisible(m, 30):
            if kf2.id not in seen:
                targets.append(kf2)
                seen.add(kf2.id)
            for kf3 in kf2.best_covisible(m, 5):
                if kf3.id not in seen:
                    targets.append(kf3)
                    seen.add(kf3.id)

        own_points = [
            m.mappoints.get(int(mid)) for mid in kf1.mp_ids if mid >= 0
        ]
        own_points = [mp for mp in own_points if mp is not None and not mp.bad]
        # One SoA build for the whole target sweep (core/matcher.py
        # FuseCandidates): per-target object->array passes dominated the
        # mapper's host cost on a single-core machine.
        from .matcher import FuseCandidates

        own_cand = FuseCandidates(own_points)
        for kf2 in targets:
            fuse(kf2, own_cand, m, self.camera)

        if targets:
            all_mids = np.unique(np.concatenate([kf2.mp_ids for kf2 in targets]))
            fuse_candidates = [
                mp
                for mp in (m.mappoints.get(int(mid)) for mid in all_mids if mid >= 0)
                if mp is not None and not mp.bad
            ]
            fuse(kf1, fuse_candidates, m, self.camera)

        refresh = [
            mp for mp in (m.mappoints.get(int(mid)) for mid in kf1.mp_ids if mid >= 0)
            if mp is not None and not mp.bad
        ]
        update_normals_batch(refresh, m)
        kf1.update_connections(m)

    # --- local bundle adjustment -------------------------------------------
    def _local_ba(self, m):
        """Optimizer::LocalBundleAdjustment (Optimizer.cc:461-841) on device:
        local = current + covisible KFs; fixed = other observers + init KF;
        10 LM iterations; prune chi2>5 / negative depth; write back."""
        kf0 = self.current_kf
        local = [kf0] + kf0.best_covisible(m, MAX_OPT_KF - 1)
        local_ids = {kf.id for kf in local}

        local_mps = {}
        for kf in local:
            for mid in kf.mp_ids:
                if mid >= 0 and mid not in local_mps:
                    mp = m.mappoints.get(int(mid))
                    if mp is not None and not mp.bad:
                        local_mps[int(mid)] = mp
        if not local_mps:
            return
        mps = list(local_mps.values())[:MAX_BA_MP]

        fixed = {}
        for mp in mps:
            for kf_id in mp.obs:
                if kf_id not in local_ids and kf_id not in fixed:
                    kf = m.keyframes.get(kf_id)
                    if kf is not None and not kf.bad:
                        fixed[kf_id] = kf
        fixed = list(fixed.values())[:MAX_FIX_KF]
        # The init KF is held fixed even when local (g2o setFixed,
        # Optimizer.cc:561).
        if len(fixed) == 0 and not any(kf.id == m.init_kf_id for kf in local):
            return  # reference aborts with 0 fixed KFs (Optimizer.cc:525-529)

        kfs = local + fixed
        # Fused-transfer problem assembly (4 uploads / 3 pulls instead of
        # 11 / 5 — round trips dominate keyframe cost on remote TPUs); sizes
        # bucketed to the next power of two so XLA keeps few compiled
        # variants while small maps move small arrays.
        prob = assemble_ba_problem(
            kfs, len(local), mps, m.init_kf_id, MAX_OPT_KF + MAX_FIX_KF
        )
        if prob is None:
            return
        cam = self.camera
        # Single-transfer dispatch: ONE upload (the fused problem wire), ONE
        # eventual pull (the fused result wire) — round trips dominate per-KF
        # mapper cost on remote TPUs.
        wire, (K, P, O, MOPP_) = problem_wire(prob)
        res_wire = ba_solve_wire(
            jnp.asarray(wire),
            jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
            self.bf, K=K, P=P, O=O, MOPP=MOPP_,
        )
        try:  # prefetch for the deferred commit (pulled at the next KF)
            res_wire.copy_to_host_async()
        except AttributeError:
            pass

        # Pipelined commit: the solve was dispatched asynchronously; results
        # are pulled and written back when the NEXT keyframe arrives (or at
        # shutdown), hiding device latency behind the tracking of the frames
        # in between — the TPU-native version of the reference's mapper
        # thread overlapping the tracking thread (System.cc:129).
        self._pending_ba = {
            "res": (res_wire,), "shape": (K, P, O),
            "obs_meta": prob["obs_meta"], "kfs": kfs,
            "mps": prob["mps"], "kf_fixed": prob["kf_fixed"], "map": m,
        }

    def _local_ba_vi(self, m):
        """Joint visual-inertial local BA: the temporal keyframe chain
        (prev_kf links) carries preintegrated inertial + bias-random-walk
        edges between consecutive states, jointly solved with the visual
        reprojection edges by ops/vi_ba.vi_ba_solve — ORB-SLAM3's
        LocalInertialBA shape, which the reference only defines g2o types
        for (/root/reference/include/G2oTypes.h:522-666). Synchronous
        commit (the VI path trades a little latency for fresher states)."""
        from ..ops.imu import preintegrate
        from ..ops.vi_ba import vi_ba_solve
        from .inertial import _stack_windows

        kf0 = self.current_kf
        chain = [kf0]
        while (
            len(chain) < MAX_OPT_KF
            and chain[-1].prev_kf is not None
            and not chain[-1].prev_kf.bad
            and chain[-1].prev_kf.id in m.keyframes
        ):
            chain.append(chain[-1].prev_kf)
        chain.reverse()  # temporal order; edges between consecutive rows
        if len(chain) < 2:
            return self._local_ba(m)
        local_ids = {kf.id for kf in chain}

        local_mps = {}
        for kf in chain:
            for mid in kf.mp_ids:
                if mid >= 0 and mid not in local_mps:
                    mp = m.mappoints.get(int(mid))
                    if mp is not None and not mp.bad:
                        local_mps[int(mid)] = mp
        if not local_mps:
            return
        mps = list(local_mps.values())[:MAX_BA_MP]

        fixed = {}
        for mp in mps:
            for kf_id in mp.obs:
                if kf_id not in local_ids and kf_id not in fixed:
                    kf = m.keyframes.get(kf_id)
                    if kf is not None and not kf.bad:
                        fixed[kf_id] = kf
        fixed = list(fixed.values())[:MAX_FIX_KF]

        kfs = chain + fixed
        K = MAX_OPT_KF + MAX_FIX_KF
        prob = assemble_ba_problem(kfs, len(chain), mps, m.init_kf_id, K)
        if prob is None:
            return

        # Inertial chain state: per-KF velocity/bias with sane defaults for
        # keyframes created after the VI init (finite-difference velocity,
        # bias carried forward from the previous keyframe).
        kf_v = np.zeros((K, 3), np.float32)
        kf_bg = np.zeros((K, 3), np.float32)
        kf_ba = np.zeros((K, 3), np.float32)
        for i, kf in enumerate(kfs):
            if kf.bias_g is not None:
                kf_bg[i] = kf.bias_g
                kf_ba[i] = kf.bias_a
            elif i > 0 and i < len(chain) and kfs[i - 1].bias_g is not None:
                kf_bg[i] = kfs[i - 1].bias_g
                kf_ba[i] = kfs[i - 1].bias_a
            if kf.velocity is not None:
                kf_v[i] = kf.velocity
            elif i > 0 and i < len(chain):
                dt = max(kf.timestamp - kfs[i - 1].timestamp, 1e-3)
                kf_v[i] = (kf.center() - kfs[i - 1].center()) / dt

        gyro, acc, dts, valid, w_ok = _stack_windows(chain, self.imu_buffer)
        E_chain = len(chain) - 1
        pre_valid = np.zeros(K - 1, bool)
        pre_valid[:E_chain] = w_ok
        pre_bg0 = np.zeros((K - 1, 3), np.float32)
        pre_ba0 = np.zeros((K - 1, 3), np.float32)
        pre_bg0[:E_chain] = kf_bg[:E_chain]
        pre_ba0[:E_chain] = kf_ba[:E_chain]

        # Pad the window stack to K-1 edges and preintegrate at each edge's
        # start-of-window bias (one vmapped lax.scan for all edges).
        cap = gyro.shape[1]
        G = np.zeros((K - 1, cap, 3), np.float32)
        A = np.zeros((K - 1, cap, 3), np.float32)
        D = np.zeros((K - 1, cap), np.float32)
        V = np.zeros((K - 1, cap), bool)
        G[:E_chain], A[:E_chain], D[:E_chain], V[:E_chain] = gyro, acc, dts, valid
        ng, na = self.imu_noise
        pres = jax.vmap(
            lambda g, a, d, v, bg, ba: preintegrate(
                g, a, d, v, bg, ba, sigma_g=ng, sigma_a=na
            )
        )(
            jnp.asarray(G), jnp.asarray(A), jnp.asarray(D), jnp.asarray(V),
            jnp.asarray(pre_bg0), jnp.asarray(pre_ba0),
        )

        cam = self.camera
        kf_pack = prob["kf_pack"]
        res = vi_ba_solve(
            jnp.asarray(kf_pack[:, 0:9].reshape(K, 3, 3)),
            jnp.asarray(kf_pack[:, 9:12]),
            jnp.asarray(kf_pack[:, 12] > 0),
            jnp.asarray(kf_pack[:, 13] > 0),
            jnp.asarray(kf_v), jnp.asarray(kf_bg), jnp.asarray(kf_ba),
            jnp.asarray(prob["mp_pack"][:, 0:3]),
            jnp.asarray(prob["mp_pack"][:, 3] > 0),
            jnp.asarray(prob["obs_pack"][:, 0].astype(np.int32)),
            jnp.asarray(prob["obs_pack"][:, 1].astype(np.int32)),
            jnp.asarray(prob["obs_pack"][:, 2:4]),
            jnp.asarray(prob["obs_pack"][:, 5] > 0),
            jnp.asarray(prob["obp"]),
            pres, jnp.asarray(pre_valid),
            jnp.asarray(pre_bg0), jnp.asarray(pre_ba0),
            cam.fx, cam.fy, cam.cx, cam.cy,
            obs_ur=jnp.asarray(prob["obs_pack"][:, 4]), bf=self.bf,
            kf_vb_fixed=jnp.asarray(
                np.arange(K) >= len(chain)
            ),  # anchors keep v/b; every chain state's v/b is free
        )
        res = jax.device_get(res)

        out_kf = np.concatenate(
            [np.asarray(res["kf_R"]).reshape(K, 9), np.asarray(res["kf_t"])],
            axis=1,
        )
        out_obs = np.stack(
            [np.asarray(res["chi2"]), np.asarray(res["depth"])], axis=1
        )
        commit_ba_result(
            (out_kf, np.asarray(res["mp_pos"]), out_obs),
            prob["obs_meta"], kfs, prob["mps"], prob["kf_fixed"], m,
        )
        v_out = np.asarray(res["kf_v"], np.float64)
        bg_out = np.asarray(res["kf_bg"], np.float64)
        ba_out = np.asarray(res["kf_ba"], np.float64)
        for i, kf in enumerate(chain):
            if not kf.bad:
                kf.velocity = v_out[i]
                kf.bias_g = bg_out[i]
                kf.bias_a = ba_out[i]

    def _prepare_local_ba(self, m, small_ok=False):
        """Assemble the local-BA problem at one of the TWO pinned mapper size
        classes (ops/mapper_step MAPPER_SMALL/MAPPER_BIG — free-running bucket
        churn previously cost a re-trace + compile-cache load per new shape
        mid-run, so exactly two variants exist). Same problem selection as
        _local_ba (Optimizer.cc:461-841). small_ok gates the SMALL class on
        the triangulation side fitting too (one size per dispatch)."""
        from ..ops.mapper_step import (
            BA_K, BA_MOPP, BA_O, BA_P, MAPPER_SMALL,
        )

        kf0 = self.current_kf
        local = [kf0] + kf0.best_covisible(m, MAX_OPT_KF - 1)
        local_ids = {kf.id for kf in local}

        local_mps = {}
        for kf in local:
            for mid in kf.mp_ids:
                if mid >= 0 and mid not in local_mps:
                    mp = m.mappoints.get(int(mid))
                    if mp is not None and not mp.bad:
                        local_mps[int(mid)] = mp
        if not local_mps:
            return None
        mps = list(local_mps.values())[:BA_P]

        fixed = {}
        for mp in mps:
            for kf_id in mp.obs:
                if kf_id not in local_ids and kf_id not in fixed:
                    kf = m.keyframes.get(kf_id)
                    if kf is not None and not kf.bad:
                        fixed[kf_id] = kf
        fixed = list(fixed.values())[:MAX_FIX_KF]
        if len(fixed) == 0 and not any(kf.id == m.init_kf_id for kf in local):
            return None  # gauge-free (Optimizer.cc:525-529)

        kfs = local + fixed
        # Size class: SMALL only when every axis surely fits. The obs count
        # is bounded ABOVE by the raw per-KF slot counts (the mopp cap and
        # the local-point join only shrink it), so the test is conservative
        # — a borderline problem takes the BIG program, never a truncation.
        sm = MAPPER_SMALL
        small = (
            small_ok
            and len(kfs) <= sm["K"]
            and len(mps) <= sm["P"]
            and sum(int(np.count_nonzero(kf.mp_ids >= 0)) for kf in kfs)
            <= sm["O"]
        )
        K = sm["K"] if small else BA_K
        P_pin = sm["P"] if small else BA_P
        O_pin = sm["O"] if small else BA_O
        prob = assemble_ba_problem(
            kfs, len(local), mps, m.init_kf_id, K,
            mopp=BA_MOPP, p_lo=P_pin, p_hi=P_pin, o_lo=O_pin, o_hi=O_pin,
        )
        if prob is None:
            return None
        wire, shapes = problem_wire(prob)
        return {
            "wire": wire, "shapes": shapes, "obs_meta": prob["obs_meta"],
            "kfs": kfs, "mps": prob["mps"], "kf_fixed": prob["kf_fixed"],
            "small": small,
        }

    def _mapper_size_class(self, tri_job, ba_job):
        """One size class per dispatch: the BA prep already folded the tri
        side into its SMALL decision; without a BA job the tri count alone
        picks the class."""
        from ..ops.mapper_step import MAPPER_BIG, MAPPER_SMALL

        if ba_job is not None:
            return MAPPER_SMALL if ba_job.get("small") else MAPPER_BIG
        n_tri = len(tri_job["cand"]) if tri_job is not None else 0
        return MAPPER_SMALL if n_tri <= MAPPER_SMALL["C"] else MAPPER_BIG

    def _build_mapper_wires(self, tri_job, ba_job, size):
        """Assemble the host-side tri/BA wires of one keyframe's fused mapper
        job (consumed by ops/mapper_step.mapper_body — standalone dispatch or
        inlined into a window program). Returns (tri_wire, ba_wire) np f32."""
        from ..ops.mapper_step import BA_MOPP

        C, K, P, O = size["C"], size["K"], size["P"], size["O"]
        tri_wire = np.zeros((C + 1, 32), np.float32)
        if tri_job is not None:
            n = len(tri_job["cand"])
            tri_wire[0, 0:12] = np.asarray(tri_job["P1"], np.float32).reshape(-1)
            tri_wire[0, 12:21] = np.asarray(tri_job["R1"], np.float32).reshape(-1)
            tri_wire[0, 21:24] = np.asarray(tri_job["t1"], np.float32)
            tri_wire[0, 24] = self.th_far_points if self.far_points else 0.0
            tri_wire[1 : n + 1, 0:12] = np.asarray(
                tri_job["P2s"], np.float32
            ).reshape(n, 12)
            tri_wire[1 : n + 1, 12:14] = tri_job["uv1"]
            tri_wire[1 : n + 1, 14:16] = tri_job["uv2"]
            # Per-candidate pose + identity metadata for the DEVICE-side
            # acceptance gates + next-window snapshot patch (ops/mapper_step).
            tri_wire[1 : n + 1, 16:25] = np.stack(
                [kf2.R for (kf2, _, _) in tri_job["cand"]]
            ).reshape(n, 9)
            tri_wire[1 : n + 1, 25:28] = np.stack(
                [kf2.t for (kf2, _, _) in tri_job["cand"]]
            )
            tri_wire[1 : n + 1, 28] = (
                np.fromiter(
                    (kf2.track_ids[b] for (kf2, _, b) in tri_job["cand"]),
                    np.int64, n,
                ).astype(np.int32).view(np.float32)
            )
            tri_wire[1 : n + 1, 29] = 1.0
        if ba_job is not None:
            ba_wire = ba_job["wire"]
        else:
            ba_wire = np.zeros(
                K * 14 + P * 4 + O * 6 + P * BA_MOPP, np.float32
            )
        return tri_wire, ba_wire

    def _dispatch_mapper_step(self, tri_job, ba_job, m):
        """Dispatch the fused triangulation+BA program (ops/mapper_step) for
        this keyframe; the result is pulled and committed at the NEXT
        keyframe (process_one -> _commit_deferred), fully overlapping the
        tracking of the frames in between."""
        from ..ops.mapper_step import mapper_step_wire

        size = self._mapper_size_class(tri_job, ba_job)
        C, K, P, O = size["C"], size["K"], size["P"], size["O"]
        tri_wire, ba_wire = self._build_mapper_wires(tri_job, ba_job, size)
        cam = self.camera
        out = mapper_step_wire(
            jnp.asarray(tri_wire),
            jnp.asarray(ba_wire),
            jnp.asarray([cam.fx, cam.fy, cam.cx, cam.cy], jnp.float32),
            self.bf,
            C=C, K=K, P=P, O=O,
        )
        # Prefetch: the result is committed one keyframe later; starting the
        # host copy now lets the D2H transfer ride out the window of tracking
        # in between instead of blocking the commit pull. The patch bundles
        # stay device-resident — the next window's dispatch consumes them
        # without any host round trip.
        try:
            out["wire"].copy_to_host_async()
        except AttributeError:
            pass
        self._deferred = {
            "out": out, "tri": tri_job, "ba": ba_job, "map": m, "size": size,
        }

    def poke_commit(self, blocking=True):
        """Land any finished deferred mapper work into the host graph NOW.

        The windowed drive calls this right before it (re)publishes the map
        snapshot for the next speculative window: the deferred job of the
        previous keyframe has had a full window of tracking to compute, so
        committing here keeps speculation at most ONE keyframe stale
        (without it, spec windows track against a snapshot missing the last
        TWO keyframes' triangulations — measured inlier decay spirals into
        tracking loss).

        blocking=False commits only if the device result has landed
        (jax.Array.is_ready): with the KF-aligned window schedule the mapper
        job dispatches at a window's LAST frame, so a blocking poke at the
        very next dispatch would stall ~the whole mapper program (measured
        ~110 ms/KF); the unfinished job then simply commits at the next
        keyframe's process_one, exactly one window later — the reference's
        own mapper-thread latency (LocalMapping.cc:50-115)."""
        self._commit_pending_ba()
        self._commit_deferred(blocking=blocking)

    # --- window-fused staging (ops/window_step mtri/mba section) -----------
    def take_staged(self, m):
        """Pop the staged window-fused mapper job if it belongs to map m.
        The caller (System._dispatch_window) inlines it into the window
        program and commits it from the window's result wire at replay."""
        st = self._staged
        if st is None or st["map"] is not m:
            return None
        self._staged = None
        return st

    def restage(self, st):
        """Put a taken-but-unexecuted job back (the speculative window that
        carried it was discarded after a rewind). The job's wires are pure
        host data — re-running them later commits the same result.

        If a NEWER job was staged in the meantime (a mid-window keyframe
        processed during the replay that caused the rewind), do not clobber
        it: dispatch the returned older job through the standalone program
        now (async) so its triangulation/BA still land, and keep the newer
        job staged for the next window."""
        if st is None or st.get("committed"):
            return
        if self._staged is not None:
            self._commit_deferred()  # land any earlier standalone job first
            if st["map"] is self.atlas.current:
                self._dispatch_mapper_step(st["tri"], st["ba"], st["map"])
            return
        self._staged = st

    def commit_fused(self, st, X, out_kf, out_mp, out_obs):
        """Commit a window-fused mapper job from the window wire's trailing
        mapper section (same writeback as _commit_deferred, host-array
        inputs)."""
        st["committed"] = True
        m = st["map"]
        if m is not self.atlas.current:
            return
        with self.map_lock:
            if st["tri"] is not None:
                self._commit_triangulation(st["tri"], X.astype(np.float64), m)
            if st["ba"] is not None:
                ba = st["ba"]
                commit_ba_result(
                    (out_kf, out_mp, out_obs), ba["obs_meta"], ba["kfs"],
                    ba["mps"], ba["kf_fixed"], m,
                )

    def dispatch_staged_async(self):
        """Launch a staged job through the standalone program WITHOUT
        blocking on its result (the windowed drive calls this when no
        speculative window dispatches to carry the job — ADVICE r3: the
        per-frame fallback frames that follow would otherwise track a
        snapshot missing the last keyframe's triangulations forever). The
        result commits at the next poke/process_one like any deferred job."""
        if self._staged is None or self._deferred is not None:
            return
        st, self._staged = self._staged, None
        if st["map"] is self.atlas.current:
            self._dispatch_mapper_step(st["tri"], st["ba"], st["map"])

    def _flush_staged(self):
        """A staged job no window consumed (per-frame fallback stretch, map
        switch, shutdown): run it through the standalone program now."""
        st, self._staged = self._staged, None
        if st is None:
            return
        self._commit_deferred()  # land any earlier standalone job first
        if st["map"] is self.atlas.current:
            self._dispatch_mapper_step(st["tri"], st["ba"], st["map"])

    def _commit_deferred(self, blocking=True):
        """Pull + commit the previous keyframe's fused mapper result: insert
        the gated triangulations, then write back the BA solution. A staged
        window-fused job is first converted to a standalone dispatch when
        blocking (it must land before graph work that assumes it did)."""
        if blocking and self._staged is not None:
            self._flush_staged()
        d = self._deferred
        if d is None:
            return
        if not blocking:
            try:
                if not d["out"]["wire"].is_ready():
                    return
            except AttributeError:
                pass
        self._deferred = None
        d["committed"] = True
        m = d["map"]
        if m is not self.atlas.current:
            return  # map was reset/switched since dispatch
        from ..ops.mapper_step import MAPPER_BIG, split_mapper_wire

        size = d.get("size", MAPPER_BIG)
        X, out_kf, out_mp, out_obs = split_mapper_wire(  # ONE pull
            d["out"]["wire"],
            C=size["C"], K=size["K"], P=size["P"], O=size["O"],
        )
        with self.map_lock:
            if d["tri"] is not None:
                self._commit_triangulation(d["tri"], X.astype(np.float64), m)
            if d["ba"] is not None:
                ba = d["ba"]
                commit_ba_result(
                    (out_kf, out_mp, out_obs), ba["obs_meta"], ba["kfs"],
                    ba["mps"], ba["kf_fixed"], m,
                )

    def _commit_pending_ba(self):
        pending = getattr(self, "_pending_ba", None)
        if pending is None:
            return
        self._pending_ba = None
        res = pending["res"]
        kfs, mps = pending["kfs"], pending["mps"]
        kf_fixed = pending["kf_fixed"]
        m = pending["map"]
        if m is not self.atlas.current:
            return  # map was reset/switched since launch

        # Device wait happens OUTSIDE the map lock (the pull blocks until
        # the solve finishes); only the graph writeback is locked.
        if "shape" in pending:
            res = split_ba_wire(res[0], *pending["shape"])
        else:
            res = tuple(np.asarray(x) for x in res)
        with self.map_lock:
            commit_ba_result(
                res, pending["obs_meta"], kfs, mps, kf_fixed, m
            )
