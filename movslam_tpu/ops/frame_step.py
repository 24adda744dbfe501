"""Fused per-frame tracking program: one device dispatch per frame.

The reference's per-frame path is a chain of host stages (extract -> match
ref KF -> PnP -> frustum-filter local map -> match -> PnP,
Tracking.cc:215-518). Through a remote TPU every stage costs a round trip;
this program fuses them into ONE jitted dispatch against a device-resident
MAP SNAPSHOT (sorted track ids + positions + ref-KF membership), which the
host republishes once per keyframe:

    inputs : image, packed MV data, previous TrackState (device-resident),
             map snapshot, prior pose, PRNG key
    outputs: new TrackState, refined pose, per-slot match/inlier masks,
             ref-gate and local-gate inlier counts

Stage semantics follow the reference: stage 1 restricts matches to
reference-keyframe points for the >=10 inlier gate (TrackReferenceKeyFrame),
stage 2 re-gates with the stage-1 pose through the full isInFrustum test
(depth, image bounds, scale-distance band, viewing angle — normals and
distance bounds ride in the snapshot) and solves on all local matches
(TrackLocalMap).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pnp import pnp_ransac

SNAP_CAP = 4096  # map-snapshot capacity (points)
N_SCALARS = 16


def packed_cols(has_dist=False, has_stereo=False):
    """Per-slot export width in INT32 words (stage 5), bit-packed:
      word 0: pt as 2 x i16 in 1/32-px fixed point (raw pixels)
      word 1: track id
      word 2: meta = age(12b) | midx+1(13b) | flags(4b)
      [+1 word pt_un (2 x i16, 1/32 px) for distorted cameras]
      [+2 words depth, ur as f32 BIT PATTERNS for stereo]
    D2H bandwidth through a remote TPU is the scarce resource (~10-30 MB/s
    effective on the tunneled link); 1/32-px keypoint quantization is ~10x
    below the MV track noise floor and only exists on the wire — the
    device-resident TrackState keeps full f32 positions. Descriptors stay
    device-side (desc_w side channel; pulled lazily per keyframe). The wire
    dtype is int32, NOT float: integer payloads in f32 lanes are denormals
    the TPU VPU flushes to zero whenever fusion routes them through vector
    registers."""
    return 3 + (1 if has_dist else 0) + (2 if has_stereo else 0)


# Legacy constant for the widest layout (tests/tools); prefer packed_cols().
PACKED_COLS = packed_cols(True, True)

PT_FIX = 32.0  # wire fixed-point scale for pixel coords (1/32 px)


def pack_pt_i32(pt):
    """(N, 2) f32 pixels -> (N,) i32 words carrying 2 x i16 1/32-px."""
    q = jnp.clip(jnp.round(pt * PT_FIX), -32767.0, 32767.0).astype(jnp.int32)
    return (q[:, 0] & 0xFFFF) | (q[:, 1] << 16)


def unpack_pt_dev(bits):
    """Device inverse of pack_pt_i32: (N,) i32 words -> (N, 2) f32 pixels."""
    x = ((bits << 16) >> 16).astype(jnp.float32) / PT_FIX  # sign-extended
    y = (bits >> 16).astype(jnp.float32) / PT_FIX
    return jnp.stack([x, y], axis=-1)


def unpack_pt_np(bits):
    """Host inverse of pack_pt_i32 ((N,) i32 -> (N, 2) f64 pixels)."""
    import numpy as np

    bits = np.asarray(bits, np.int32)
    x = ((bits << 16) >> 16).astype(np.float64) / PT_FIX
    y = (bits >> 16).astype(np.float64) / PT_FIX
    return np.stack([x, y], axis=-1)


def undistort_points_jax(uv, intr, dist):
    """Batched iterative keypoint undistortion (Frame.cc:682-713 /
    cv::undistortPoints equivalent): 8 fixed-point iterations of the inverse
    Brown-Conrady model. dist = (k1, k2, p1, p2, k3)."""
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x0 = (uv[..., 0] - cx) / fx
    y0 = (uv[..., 1] - cy) / fy
    x, y = x0, y0
    for _ in range(8):
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


def prep_snapshot(snap_fused):
    """Sort the row-order snapshot track ids IN-PROGRAM.

    snap_fused: (P, 12) f32 — core/snapshot.py layout (col 10 = tid i32 bits
    in row order, invalid rows int32-max). Returns (snap_pack (P,10),
    tid_sorted (P,), perm (P,) sorted-position -> row). Stable sort keeps
    duplicate ids resolving to the first-inserted row (map::insert
    first-wins), matching the host graph's claim order. Computed once per
    dispatch (per window in the windowed drive) so the windowed drive can
    patch rows on device before sorting."""
    snap_pack = snap_fused[:, 0:10]
    tid = jax.lax.bitcast_convert_type(snap_fused[:, 10], jnp.int32)
    perm = jnp.argsort(tid, stable=True).astype(jnp.int32)
    return snap_pack, tid[perm], perm


def match_snapshot(track_id, valid, snap_tid_sorted, snap_perm, snap_valid):
    """Join frame tracks against the snapshot by track id.

    snap_tid_sorted: (P,) ascending (invalid = int32 max); snap_perm maps
    sorted position -> original snapshot row. Returns (match_idx (N,) into
    the snapshot or -1)."""
    P = snap_tid_sorted.shape[0]
    pos = jnp.searchsorted(snap_tid_sorted, track_id)
    pos_c = jnp.minimum(pos, P - 1)
    hit = (snap_tid_sorted[pos_c] == track_id) & valid & (track_id >= 0)
    hit = hit & snap_valid[snap_perm[pos_c]]
    return jnp.where(hit, snap_perm[pos_c], -1)


def _project_gate(R, t, pos, intr, bounds, normal, mind, maxd):
    """Full isInFrustum gate (Frame.cc:456-532 / Tracking.cc:1143): depth,
    in-image (undistorted bounds, Frame::ComputeImageBounds),
    scale-invariance distance band, viewing angle < 60 deg.
    bounds = (minx, maxx, miny, maxy)."""
    pc = pos @ R.T + t
    z = pc[:, 2]
    u = intr[0] * pc[:, 0] / jnp.maximum(z, 1e-6) + intr[2]
    v = intr[1] * pc[:, 1] / jnp.maximum(z, 1e-6) + intr[3]
    Ow = -jnp.einsum("ji,j->i", R, t)  # R^T t with sign
    po = pos - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    cosv = jnp.einsum("pi,pi->p", po, normal) / jnp.maximum(dist, 1e-9)
    ok = (
        (z > 0)
        & (u >= bounds[0]) & (u < bounds[1])
        & (v >= bounds[2]) & (v < bounds[3])
        & (dist >= 0.8 * mind) & (dist <= 1.2 * maxd)
        & (cosv > 0.5)
    )
    return jnp.stack([u, v], axis=-1), ok


def _frame_program_body(
    img,
    prev_img,
    prev_state,
    mv_pack,
    kps_pack,
    coverage_area,
    prior_R,
    prior_t,
    snap_fused,
    intr,
    key,
    dist_pack=None,
    img_right=None,
    *,
    reproj_err,
    threshold,
    coverage_threshold,
    capacity,
    max_cov,
    has_dist=False,
    has_stereo=False,
):
    """Shared per-frame program body (stages 1-5 of the fused step). Used by
    both tracked_frame_step (one frame per dispatch) and
    window_step.tracked_window_step (W frames per dispatch via lax.scan).

    Returns (new_state, packed (N,16f32... see below), scalars (16,),
    snap_visible (P,) bool, R2, t2, chain_ok) where chain_ok mirrors the host
    gate that advances the pose chain (res2.ok AND n_ref >= 10,
    core/tracking.py track_fused)."""
    from ..core.extractor import _p_frame_body

    H, W = img.shape
    if dist_pack is None:
        dist_pack = jnp.zeros(10, jnp.float32)
        bounds = jnp.asarray([0.0, float(W), 0.0, float(H)], jnp.float32)
    else:
        bounds = dist_pack[5:9]
    # The map snapshot arrives prepped (prep_snapshot): either the fused
    # (P, 12) upload or a pre-sorted (pack, tid_sorted, perm) tuple — the
    # window program preps ONCE per window after its device-side patch.
    if isinstance(snap_fused, tuple):
        snap_pack, snap_tid_sorted, snap_perm = snap_fused
    else:
        snap_pack, snap_tid_sorted, snap_perm = prep_snapshot(snap_fused)
    snap_pos = snap_pack[:, 0:3]
    snap_normal = snap_pack[:, 3:6]
    snap_mind = snap_pack[:, 6]
    snap_maxd = snap_pack[:, 7]
    snap_valid = snap_pack[:, 8] > 0
    snap_ref_mask = snap_pack[:, 9] > 0

    # --- 1. feature tracking (MV propagation + LK + seeding) ---------------
    state = _p_frame_body(
        img,
        prev_img,
        prev_state,
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

    # --- 1b. keypoint undistortion (Frame.cc:682-713): geometry (PnP, BA,
    # triangulation) uses undistorted pixels; the raw positions stay in the
    # TrackState for image-domain work (MV propagation, LK, descriptors).
    if has_dist:
        pt_un = undistort_points_jax(state.pt, intr, dist_pack)
    else:
        pt_un = state.pt

    # --- 1c. stereo depth: batched left->right LK + epipolar/disparity
    # gates + median trim (Frame::ComputeStereoMatches, Frame.cc:281-354) —
    # fused into the same dispatch instead of a separate device call.
    N_slots = state.pt.shape[0]
    if has_stereo:
        from .lk import lk_track

        bf = dist_pack[9]
        lk_r, st_ok = lk_track(img, img_right, state.pt, state.valid)
        dy = jnp.abs(lk_r[:, 1] - state.pt[:, 1])
        disp = state.pt[:, 0] - lk_r[:, 0]
        good = st_ok & state.valid & (dy < 2.0) & (disp > 0.1) & (disp < bf)
        depth = jnp.where(good, bf / jnp.maximum(disp, 0.1), -1.0)
        # Median-distance outlier trim (Frame.cc:334-352): masked median.
        dsort = jnp.sort(jnp.where(good, depth, jnp.inf))
        n_good = jnp.sum(good.astype(jnp.int32))
        med = dsort[jnp.maximum(n_good - 1, 0) // 2]
        good = good & jnp.where(n_good > 10, depth < 6.0 * med, True)
        depth = jnp.where(good, depth, -1.0)
        ur = jnp.where(good, lk_r[:, 0], -1.0)
    else:
        depth = jnp.full((N_slots,), -1.0)
        ur = jnp.full((N_slots,), -1.0)

    # --- 2. map association by track id -------------------------------------
    midx = match_snapshot(
        state.track_id, state.valid, snap_tid_sorted, snap_perm, snap_valid
    )  # (N,)
    msafe = jnp.maximum(midx, 0)
    mpos = snap_pos[msafe]

    # --- 3. stage 1: reference-keyframe gate + pose from prior -------------
    nrm = snap_normal[msafe]
    mind = snap_mind[msafe]
    maxd = snap_maxd[msafe]
    _, gate_prior = _project_gate(
        prior_R, prior_t, mpos, intr, bounds, nrm, mind, maxd
    )
    matched = midx >= 0
    is_ref = snap_ref_mask[msafe] & matched
    k1, k2 = jax.random.split(key)
    bf_s = dist_pack[9] if has_stereo else 0.0
    ur_pnp = jnp.where(matched, ur, -1.0) if has_stereo else None
    res1 = pnp_ransac(
        mpos, pt_un, is_ref & gate_prior, intr[0], intr[1], intr[2], intr[3],
        k1, reproj_err, prior_R, prior_t, ur=ur_pnp, bf=bf_s,
    )
    n_ref = res1["n_inliers"]
    R1 = jnp.where(res1["ok"], res1["R"], prior_R)
    t1 = jnp.where(res1["ok"], res1["t"], prior_t)

    # --- 4. stage 2: full local-map solve from the stage-1 pose ------------
    _, gate1 = _project_gate(R1, t1, mpos, intr, bounds, nrm, mind, maxd)
    use2 = matched & gate1
    # Visibility over the WHOLE snapshot (SearchLocalPoints increments
    # IncreaseVisible for every frustum-passing point, matched or not,
    # Tracking.cc:1143-1147 — found/visible drives MapPointCulling).
    _, snap_visible = _project_gate(
        R1, t1, snap_pos, intr, bounds, snap_normal, snap_mind, snap_maxd
    )
    snap_visible = snap_visible & snap_valid
    res2 = pnp_ransac(
        mpos, pt_un, use2, intr[0], intr[1], intr[2], intr[3],
        k2, reproj_err, R1, t1, ur=ur_pnp, bf=bf_s,
    )

    # --- 5. packed export. D2H bandwidth over a remote TPU is ~15-75 MB/s
    # (measured), so the wire carries only what the host consumes for the
    # active configuration (packed_cols); descriptors stay device-resident
    # (desc_w in the window program / state in the per-frame one).
    N = state.pt.shape[0]
    flags_i = (
        use2.astype(jnp.int32)
        + 2 * res2["inliers"].astype(jnp.int32)
        + 4 * state.valid.astype(jnp.int32)
        + 8 * state.coverage.astype(jnp.int32)
    )
    # meta word: age(0:12) | midx+1(12:25) | flags(25:29) — see packed_cols.
    # 12 age bits cover the keyint=1000 track-lifetime regime; 13 midx bits
    # cover SNAP_CAP=4096 (+1 for the no-match sentinel).
    meta = (
        jnp.clip(state.age, 0, 4095)
        | ((jnp.maximum(midx, -1) + 1) << 12)
        | (flags_i << 25)
    )
    # The packed export is INT32, never float: integer values carried as
    # f32 bit patterns are denormals the TPU VPU silently flushes to zero
    # whenever XLA happens to fuse the export concat with compute
    # (measured: every track id on the wire read back 0 — fusion-dependent,
    # so it can appear with any layout change). Float payloads ride as
    # bitcast i32 instead; integer lanes are immune to FTZ.
    cols = [
        pack_pt_i32(state.pt)[:, None],  # 0: raw pixels (2 x i16, 1/32 px)
        state.track_id[:, None],         # 1: track id
        meta[:, None],                   # 2
    ]
    if has_dist:
        cols.append(pack_pt_i32(pt_un)[:, None])  # +1: undistorted
    if has_stereo:
        cols.append(
            jax.lax.bitcast_convert_type(depth, jnp.int32)[:, None]
        )  # +1: stereo depth f32 bits (-1 = none)
        cols.append(
            jax.lax.bitcast_convert_type(ur, jnp.int32)[:, None]
        )  # +1: right-image u f32 bits (-1 = none)
    packed = jnp.concatenate(cols, axis=1)  # (N, packed_cols(...)) i32

    scalars = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(
                jnp.concatenate([res2["R"].reshape(-1), res2["t"]]),
                jnp.int32,
            ),                             # 0:12 pose f32 bits
            jnp.stack(
                [
                    n_ref.astype(jnp.int32),
                    res2["n_inliers"].astype(jnp.int32),
                    res2["ok"].astype(jnp.int32),
                    state.next_id,         # 15: extractor counter
                ]
            ),                             # 12:16
        ]
    )
    chain_ok = res2["ok"] & (n_ref >= 10)
    return state, packed, scalars, snap_visible, res2["R"], res2["t"], chain_ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_mvs", "reproj_err", "threshold", "coverage_threshold",
        "capacity", "max_cov", "has_dist", "has_stereo",
    ),
)
def tracked_frame_step(
    img,
    prev_img,
    prev_state,
    mvk_pack,
    aux,
    snap_fused,
    intr,
    key,
    dist_pack=None,
    img_right=None,
    *,
    n_mvs,
    reproj_err,
    threshold,
    coverage_threshold,
    capacity,
    max_cov,
    has_dist=False,
    has_stereo=False,
):
    """Fused per-frame program. Remote-TPU transfer budget per frame:
    2 uploads (img, mvk_pack) + 1 dispatch + 1 pull (the "wire" buffer).
    mvk_pack is the `MotionVectorImage.packed_joint()` layout plus two
    trailer rows: rows [0:n_mvs] = MVs, rows [n_mvs:-2] = kps, and the last
    2 rows carry aux = [prior_R(9), prior_t(3), coverage_area] flattened
    (pass aux=None to use them; a separate (13,) aux is also accepted).
    Per-run constants (reproj/threshold/coverage) are static; the PRNG key
    chains on-device (out["key"] feeds the next frame — no eager split RPC).
    """
    if aux is None:
        aux = mvk_pack[-2:].reshape(-1)[0:13]
        mvk_pack = mvk_pack[:-2]
    mv_pack = mvk_pack[:n_mvs]
    kps_pack = mvk_pack[n_mvs:, 0:5]
    prior_R = aux[0:9].reshape(3, 3)
    prior_t = aux[9:12]
    coverage_area = aux[12]
    key_out, key = jax.random.split(key)

    state, packed, scalars, snap_visible, _, _, _ = _frame_program_body(
        img, prev_img, prev_state, mv_pack, kps_pack, coverage_area,
        prior_R, prior_t, snap_fused, intr, key,
        dist_pack, img_right,
        reproj_err=reproj_err, threshold=threshold,
        coverage_threshold=coverage_threshold, capacity=capacity,
        max_cov=max_cov, has_dist=has_dist, has_stereo=has_stereo,
    )

    # ONE pull: everything the host needs in a single flat INT32 buffer
    # (device_get is one RPC per pytree leaf on remote TPUs; visibility is
    # bit-packed — D2H bandwidth is the scarce resource; int32 because the
    # TPU VPU flushes denormal f32 bit patterns to zero when fused).
    wire = jnp.concatenate(
        [packed.reshape(-1), scalars, pack_bits_i32(snap_visible)]
    )
    return {
        "state": state,  # stays device-resident for the next frame
        "key": key_out,  # PRNG chain stays device-resident too
        "wire": wire,    # host: N*packed_cols | 16 scalars | P/32 vis bits
        "packed": packed,
        "scalars": scalars,
        "snap_visible": snap_visible,
    }


def pack_bits_i32(b):
    """(P,) bool -> (P/32,) i32 carrying the u32 bitmask (P % 32 == 0)."""
    P = b.shape[0]
    w = b.reshape(P // 32, 32).astype(jnp.uint32) << jnp.arange(
        32, dtype=jnp.uint32
    )[None, :]
    return jax.lax.bitcast_convert_type(
        jnp.sum(w, axis=1, dtype=jnp.uint32), jnp.int32
    )


def unpack_bits_np(i32_words, n):
    """Host inverse of pack_bits_i32: (P/32,) i32 -> (n,) bool."""
    import numpy as np

    u = np.ascontiguousarray(i32_words, np.int32).view(np.uint32)
    bits = (u[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    return bits.reshape(-1)[:n].astype(bool)
