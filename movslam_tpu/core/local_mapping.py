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
import jax.numpy as jnp

from ..ops.ba import ba_solve, build_obs_by_point
from ..ops.triangulate import triangulate
from .map import KeyFrame, MapPoint
from .matcher import fuse, search_for_triangulation

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
        return len(self.queue) == 0 and self.cooldown == 0

    def spin(self):
        """Process everything queued (synchronous drive; the threaded mode
        calls this in a loop)."""
        while self.queue:
            self.process_one()

    def process_one(self):
        if not self.queue:
            return
        kf = self.queue.pop(0)
        self.current_kf = kf
        m = self.atlas.current

        self._process_new_keyframe(kf, m)
        self._map_point_culling(m)
        self._create_new_map_points(m)
        if not self.queue:
            self._search_in_neighbors(m)
        if not self.queue and m.n_keyframes() > 2:
            import time

            t0 = time.perf_counter()
            self._local_ba(m)
            self.lba_ms.append(1e3 * (time.perf_counter() - t0))
            self.lba_count += 1

    # --- stages -----------------------------------------------------------
    def _process_new_keyframe(self, kf, m):
        """LocalMapping::ProcessNewKeyFrame (LocalMapping.cc:171-212)."""
        for slot, mid in enumerate(kf.mp_ids):
            if mid < 0:
                continue
            mp = m.mappoints.get(int(mid))
            if mp is None or mp.bad:
                kf.mp_ids[slot] = -1
                continue
            if kf.id not in mp.obs:
                mp.add_observation(kf, slot)
                mp.update_normal_and_depth(m)
            else:
                # Can only happen for fresh stereo points from Tracking.
                self.recent_points.append(mp)
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
        kf1 = self.current_kf
        neighbors = kf1.best_covisible(m, 30)
        if not neighbors:
            return
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
            return

        uv1 = np.stack([kf1.pts[a] for (_, a, _) in cand])
        uv2 = np.stack([kf2.pts[b] for (kf2, _, b) in cand])

        # Batch triangulation: vmap over per-pair P2 (stack to (C,3,4)).
        P2s = np.stack(P2s)
        C = len(cand)
        X = np.zeros((C, 3))
        # triangulate() takes fixed P1/P2; loop over unique P2 groups instead:
        # group candidate indices by neighbor KF for batched calls.
        from collections import defaultdict

        groups = defaultdict(list)
        for i, (kf2, _, _) in enumerate(cand):
            groups[kf2.id].append(i)
        for kf2_id, idxs in groups.items():
            idxs = np.array(idxs)
            Xg = np.asarray(
                triangulate(
                    jnp.asarray(P1, jnp.float32),
                    jnp.asarray(P2s[idxs[0]], jnp.float32),
                    jnp.asarray(uv1[idxs], jnp.float32),
                    jnp.asarray(uv2[idxs], jnp.float32),
                )
            )
            X[idxs] = Xg

        created = 0
        for i, (kf2, s1_, s2_) in enumerate(cand):
            x3d = X[i].astype(np.float64)

            # Stereo mode: prefer stereo unprojection when the stereo
            # parallax beats the motion parallax (LocalMapping.cc:341-393) —
            # low-baseline mono triangulation of far points is depth-biased.
            if not self.monocular:
                z1s = kf1.depth_right[s1_] if kf1.depth_right is not None else -1
                z2s = kf2.depth_right[s2_] if kf2.depth_right is not None else -1
                bs1 = z1s > 0
                bs2 = z2s > 0
                cps1 = np.cos(2 * np.arctan2(self.stereo_b / 2, z1s)) if bs1 else 2.0
                cps2 = np.cos(2 * np.arctan2(self.stereo_b / 2, z2s)) if bs2 else 2.0
                if bs1 and cps1 <= cps2:
                    uv_ = kf1.pts[s1_]
                    pc = np.array(
                        [
                            (uv_[0] - cam.cx) * z1s / cam.fx,
                            (uv_[1] - cam.cy) * z1s / cam.fy,
                            z1s,
                        ]
                    )
                    x3d = kf1.R.T @ (pc - kf1.t)
                elif bs2 and cps2 < cps1:
                    uv_ = kf2.pts[s2_]
                    R2_, t2_ = kf2.pose()
                    pc = np.array(
                        [
                            (uv_[0] - cam.cx) * z2s / cam.fx,
                            (uv_[1] - cam.cy) * z2s / cam.fy,
                            z2s,
                        ]
                    )
                    x3d = R2_.T @ (pc - t2_)
                # else: both mono -> keep the triangulated solution

            if not np.all(np.isfinite(x3d)):
                continue
            R2, t2 = kf2.pose()
            z1 = R1[2] @ x3d + t1[2]
            z2 = R2[2] @ x3d + t2[2]
            if z1 <= 0 or z2 <= 0:
                continue
            # Reprojection gates (err^2 <= delta, LocalMapping.cc:416-463).
            ok = True
            for (R_, t_, z_, uv_) in ((R1, t1, z1, uv1[i]), (R2, t2, z2, uv2[i])):
                pc = R_ @ x3d + t_
                u = cam.fx * pc[0] / pc[2] + cam.cx
                v = cam.fy * pc[1] / pc[2] + cam.cy
                if (u - uv_[0]) ** 2 + (v - uv_[1]) ** 2 > REPROJ_TRI:
                    ok = False
                    break
            if not ok:
                continue
            d1 = np.linalg.norm(x3d - Ow1)
            d2 = np.linalg.norm(x3d - kf2.center())
            if d1 == 0 or d2 == 0:
                continue
            if self.far_points and (d1 >= self.th_far_points or d2 >= self.th_far_points):
                continue
            if kf1.mp_ids[s1_] >= 0 or kf2.mp_ids[s2_] >= 0:
                continue  # claimed by an earlier pair this round
            track_id = int(kf2.track_ids[s2_])
            mp = MapPoint(x3d, kf1.id, track_id, m.id)
            mp.add_observation(kf1, s1_)
            mp.add_observation(kf2, s2_)
            kf1.add_mappoint(mp, s1_)
            kf2.add_mappoint(mp, s2_)
            m.add_mappoint(mp)
            mp.update_normal_and_depth(m)
            self.recent_points.append(mp)
            created += 1
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
        for kf2 in targets:
            fuse(kf2, own_points, m, self.camera)

        fuse_candidates = {}
        for kf2 in targets:
            for mid in kf2.mp_ids:
                if mid >= 0 and mid not in fuse_candidates:
                    mp = m.mappoints.get(int(mid))
                    if mp is not None and not mp.bad:
                        fuse_candidates[mid] = mp
        fuse(kf1, list(fuse_candidates.values()), m, self.camera)

        for mid in kf1.mp_ids:
            if mid >= 0:
                mp = m.mappoints.get(int(mid))
                if mp is not None and not mp.bad:
                    mp.update_normal_and_depth(m)
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
        K = MAX_OPT_KF + MAX_FIX_KF
        P = MAX_BA_MP
        O = MAX_BA_OBS

        kf_index = {kf.id: i for i, kf in enumerate(kfs)}
        mp_index = {mp.id: j for j, mp in enumerate(mps)}

        kf_R = np.zeros((K, 3, 3), np.float32)
        kf_R[:, 0, 0] = kf_R[:, 1, 1] = kf_R[:, 2, 2] = 1.0
        kf_t = np.zeros((K, 3), np.float32)
        kf_fixed = np.ones(K, bool)
        kf_valid = np.zeros(K, bool)
        for i, kf in enumerate(kfs):
            kf_R[i] = kf.R
            kf_t[i] = kf.t
            kf_valid[i] = True
            kf_fixed[i] = (i >= len(local)) or (kf.id == m.init_kf_id)

        mp_pos = np.zeros((P, 3), np.float32)
        mp_valid = np.zeros(P, bool)
        for j, mp in enumerate(mps):
            mp_pos[j] = mp.pos
            mp_valid[j] = True

        # --- vectorized observation assembly (the per-KF slot arrays are the
        # ground truth; no per-observation Python loops) -----------------
        mp_id_arr = np.fromiter((mp.id for mp in mps), np.int64, len(mps))
        mp_lookup = {int(mid): j for j, mid in enumerate(mp_id_arr)}
        blocks = []  # (kf_idx arr, mp_idx arr, uv arr, ur arr, slot arr)
        for i, kf in enumerate(kfs):
            slots = np.flatnonzero(kf.mp_ids >= 0)
            if len(slots) == 0:
                continue
            mids = kf.mp_ids[slots]
            j_idx = np.array([mp_lookup.get(int(mid), -1) for mid in mids])
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
            return
        all_kf = np.concatenate([b[0] for b in blocks])
        all_mp = np.concatenate([b[1] for b in blocks])
        all_uv = np.concatenate([b[2] for b in blocks])
        all_ur = np.concatenate([b[3] for b in blocks])
        all_slot = np.concatenate([b[4] for b in blocks])

        # Cap observations per point at MOPP (Schur pair terms must see every
        # observation that enters the gradient) and total at O. Within a
        # point, keep the CHRONOLOGICALLY earliest keyframes — they carry the
        # widest baselines and hence the strongest depth constraints
        # (covisibility-ordered capping measurably degrades geometry).
        all_kfid = np.concatenate(
            [np.full(len(b[0]), kfs[int(b[0][0])].id, np.int64) for b in blocks]
        )
        order = np.lexsort((all_kfid, all_mp))
        mp_sorted = all_mp[order]
        first = np.concatenate([[True], mp_sorted[1:] != mp_sorted[:-1]])
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(order)), 0))
        within = np.arange(len(order)) - group_start
        keep_sorted = within < MOPP
        # Point-major selection for the total cap: complete points survive,
        # rather than silently dropping all observations of later keyframes.
        sel = order[keep_sorted][:O]

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

        obp = build_obs_by_point(
            np.where(obs_valid, obs_mp, P), P, MOPP, O
        )

        res = ba_solve(
            jnp.asarray(kf_R), jnp.asarray(kf_t),
            jnp.asarray(kf_fixed), jnp.asarray(kf_valid),
            jnp.asarray(mp_pos), jnp.asarray(mp_valid),
            jnp.asarray(obs_kf), jnp.asarray(obs_mp),
            jnp.asarray(obs_uv), jnp.asarray(obs_valid),
            jnp.asarray(obp),
            self.camera.fx, self.camera.fy, self.camera.cx, self.camera.cy,
            obs_ur=jnp.asarray(obs_ur), bf=self.bf,
        )

        chi2 = np.asarray(res["chi2"])
        depth = np.asarray(res["depth"])
        R_out = np.asarray(res["kf_R"], np.float64)
        t_out = np.asarray(res["kf_t"], np.float64)
        X_out = np.asarray(res["mp_pos"], np.float64)

        # Prune bad observations (chi2 > 5 or negative depth).
        o_kf, o_mp, o_slot = obs_meta
        bad_o = np.flatnonzero(
            (chi2[: len(o_kf)] > CHI2_PRUNE) | (depth[: len(o_kf)] <= 0)
        )
        for o in bad_o:
            mp = mps[o_mp[o]]
            if mp.bad:
                continue
            kf = kfs[o_kf[o]]
            kf.erase_mappoint_slot(int(o_slot[o]))
            mp.remove_observation(kf.id)

        # Write back.
        for i, kf in enumerate(kfs):
            if not kf_fixed[i]:
                kf.set_pose(R_out[i], t_out[i])
        for j, mp in enumerate(mps):
            if not mp.bad:
                mp.pos = X_out[j]
                mp.update_normal_and_depth(m)

        m.bump_change()
