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


def _project_gate(R, t, pos, intr, width, height, normal, mind, maxd):
    """Full isInFrustum gate (Frame.cc:456-532 / Tracking.cc:1143): depth,
    in-image, scale-invariance distance band, viewing angle < 60 deg."""
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
        & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        & (dist >= 0.8 * mind) & (dist <= 1.2 * maxd)
        & (cosv > 0.5)
    )
    return jnp.stack([u, v], axis=-1), ok


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_mvs", "reproj_err", "threshold", "coverage_threshold",
        "capacity", "max_cov",
    ),
)
def tracked_frame_step(
    img,
    prev_img,
    prev_state,
    mvk_pack,
    aux,
    snap_tid_sorted,
    snap_perm,
    snap_pack,
    intr,
    key,
    *,
    n_mvs,
    reproj_err,
    threshold,
    coverage_threshold,
    capacity,
    max_cov,
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
    from ..core.extractor import _p_frame_body

    if aux is None:
        aux = mvk_pack[-2:].reshape(-1)[0:13]
        mvk_pack = mvk_pack[:-2]
    mv_pack = mvk_pack[:n_mvs]
    kps_pack = mvk_pack[n_mvs:, 0:5]
    prior_R = aux[0:9].reshape(3, 3)
    prior_t = aux[9:12]
    coverage_area = aux[12]
    key_out, key = jax.random.split(key)

    H, W = img.shape
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
    _, gate_prior = _project_gate(prior_R, prior_t, mpos, intr, W, H, nrm, mind, maxd)
    matched = midx >= 0
    is_ref = snap_ref_mask[msafe] & matched
    k1, k2 = jax.random.split(key)
    res1 = pnp_ransac(
        mpos, state.pt, is_ref & gate_prior, intr[0], intr[1], intr[2], intr[3],
        k1, reproj_err, prior_R, prior_t,
    )
    n_ref = res1["n_inliers"]
    R1 = jnp.where(res1["ok"], res1["R"], prior_R)
    t1 = jnp.where(res1["ok"], res1["t"], prior_t)

    # --- 4. stage 2: full local-map solve from the stage-1 pose ------------
    _, gate1 = _project_gate(R1, t1, mpos, intr, W, H, nrm, mind, maxd)
    use2 = matched & gate1
    # Visibility over the WHOLE snapshot (SearchLocalPoints increments
    # IncreaseVisible for every frustum-passing point, matched or not,
    # Tracking.cc:1143-1147 — found/visible drives MapPointCulling).
    _, snap_visible = _project_gate(
        R1, t1, snap_pos, intr, W, H, snap_normal, snap_mind, snap_maxd
    )
    snap_visible = snap_visible & snap_valid
    res2 = pnp_ransac(
        mpos, state.pt, use2, intr[0], intr[1], intr[2], intr[3],
        k2, reproj_err, R1, t1,
    )

    # --- 5. packed export: leaf-per-RPC device pulls dominate remote-TPU
    # latency, so everything the host needs travels as TWO arrays.
    N = state.pt.shape[0]
    tid_f = jax.lax.bitcast_convert_type(state.track_id, jnp.float32)
    desc_f = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(state.desc, jnp.int32), jnp.float32
    )
    flags = (
        use2.astype(jnp.int32)
        + 2 * res2["inliers"].astype(jnp.int32)
        + 4 * state.valid.astype(jnp.int32)
        + 8 * state.coverage.astype(jnp.int32)
    ).astype(jnp.float32)
    packed = jnp.concatenate(
        [
            state.pt,                      # 0:2
            tid_f[:, None],                # 2 (i32 bits)
            state.age.astype(jnp.float32)[:, None],  # 3
            desc_f,                        # 4:12 (u32 bits)
            jnp.maximum(midx, -1).astype(jnp.float32)[:, None],  # 12
            flags[:, None],                # 13
        ],
        axis=1,
    )  # (N, 14)

    P = snap_pack.shape[0]
    scalars = jnp.concatenate(
        [
            res2["R"].reshape(-1),         # 0:9
            res2["t"],                     # 9:12
            jnp.stack(
                [
                    n_ref.astype(jnp.float32),
                    res2["n_inliers"].astype(jnp.float32),
                    res2["ok"].astype(jnp.float32),
                ]
            ),                             # 12:15
        ]
    )

    # ONE pull: everything the host needs in a single flat buffer
    # (device_get is one RPC per pytree leaf on remote TPUs).
    wire = jnp.concatenate(
        [packed.reshape(-1), scalars, snap_visible.astype(jnp.float32)]
    )
    return {
        "state": state,  # stays device-resident for the next frame
        "key": key_out,  # PRNG chain stays device-resident too
        "wire": wire,    # host splits: N*14 packed | 15 scalars | P visible
        "packed": packed,
        "scalars": scalars,
        "snap_visible": snap_visible,
    }
