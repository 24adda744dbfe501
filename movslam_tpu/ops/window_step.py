"""Windowed multi-frame tracking: W frames per device dispatch.

The TPU rebuild's throughput axis (SURVEY.md §5 "batched-time"): the
reference's decoder keeps a 12-deep lookahead queue
(/root/reference/src/VideoDecoder.cc:163-368,
Examples/Monocular/mono_video_tartan.cc:55), so W decoded MV frames are
available ahead of the tracker at any time. Instead of one device dispatch
per frame (whose host<->device round trips put a hard floor under per-frame
latency on remote TPUs), this program `lax.scan`s the fused frame body
(ops/frame_step._frame_program_body) across a window of W frames:

    carry  : TrackState, previous image, PRNG key, pose chain
             (last pose + constant-velocity model, Tracking.cc:414-424)
    per it : MV propagation + coverage LK + seeding + snapshot matching +
             two-stage PnP — identical math to the per-frame program
    ys     : per-frame packed track exports + pose/inlier scalars +
             snapshot-visibility masks

The host replays the W per-frame results through the unchanged Tracking
state machine (keyframe decisions, map bookkeeping). The map snapshot is
frozen for the window — a keyframe created at frame k inside the window
only becomes matchable at the next window, which is the batching's only
semantic deviation (bounded by W frames; the reference's own mapper-thread
latency delays new points similarly, LocalMapping.cc:50-115).

Transfer budget: 2 uploads (image stack, MV stack) + 1 dispatch + 1 pull
for W frames, vs W * (2 uploads + 1 pull) in per-frame mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .frame_step import _frame_program_body, prep_snapshot
from .mapper_step import MAPPER_SMALL, mapper_body


def _apply_patch(snap_fused, patch_tri, patch_mp, patch_meta):
    """Scatter a deferred mapper job's device-resident results into the map
    snapshot: BA-moved point positions + device-gated new triangulations
    (rows [n_base, n_base + C_PATCH) of the reserved tail). Invalid rows are
    dropped via out-of-bounds indices (mode='drop'). The host graph commits
    the same results at the next keyframe — this patch only freshens the
    window's transient device view (the snapshot the reference's tracker
    would see after its mapper thread finished, LocalMapping.cc:50-115)."""
    P = snap_fused.shape[0]
    n_base = patch_meta[0].astype(jnp.int32)
    rows_ba = patch_meta[1:].astype(jnp.int32)  # (P_PATCH,); >= P drops
    fused = snap_fused.at[rows_ba, 0:3].set(patch_mp, mode="drop")

    X = patch_tri[:, 0:3]
    tidb = patch_tri[:, 3]
    ok = patch_tri[:, 4] > 0
    nrm = patch_tri[:, 5:8]
    mind = patch_tri[:, 8:9]
    maxd = patch_tri[:, 9:10]
    idx = n_base + jnp.arange(patch_tri.shape[0], dtype=jnp.int32)
    rows_t = jnp.where(ok & (idx < P), idx, P)
    one = jnp.ones_like(tidb)[:, None]
    newrow = jnp.concatenate(
        [
            X,
            nrm,
            mind,                             # host-parity distance band
            maxd,                             # (update_normals_batch)
            one,                              # valid
            one,                              # ref-KF member: fresh points
                                              # back the stage-1 ref gate
            tidb[:, None],                    # track id (i32 bits)
            jnp.zeros_like(tidb)[:, None],
        ],
        axis=1,
    )
    return fused.at[rows_t].set(newrow, mode="drop")


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_mvs", "reproj_err", "threshold", "coverage_threshold",
        "capacity", "max_cov", "has_dist", "has_stereo",
    ),
)
def tracked_window_step(
    imgs,
    prev_img,
    prev_state,
    mvk_packs,
    pose_pack,
    snap_fused,
    intr,
    key,
    dist_pack=None,
    imgs_right=None,
    patch_tri=None,
    patch_mp=None,
    patch_meta=None,
    mtri=None,
    mba=None,
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
    """W-frames-per-dispatch tracking program.

    imgs      : (W, H, Wd) u8 — the window's gray frames.
    prev_img  : (H, Wd) u8 — frame before the window (device-resident).
    prev_state: TrackState entering the window.
    mvk_packs : (W, M+K+1, 8) i16 — per-frame packed_joint_i16(): deltas in
                1/64-pel fixed point, rects/dindx/valid as integers, one
                trailer row with coverage_area in Q14 (the pose chain is
                computed on device, so no pose trailer is needed). i16 halves
                the window's MV upload on the bandwidth-bound tunnel link.
    pose_pack : (25,) f32 — [last_R(9) | last_t(3) | vel_R(9) | vel_t(3) |
                has_vel(1)]: the pose chain's entry point (last frame's pose
                plus the host's constant-velocity model if any).
    Returns dict(state, key, wire) where wire flattens, per frame-major:
    W*N*packed_cols packed words | W*16 scalars | W*P/32 visibility bits
    [| fused mapper section].
    """
    W = imgs.shape[0]
    N = prev_state.pt.shape[0]
    P = snap_fused.shape[0]

    # Fused per-keyframe mapper section: the previous keyframe's
    # triangulation + local BA (ops/mapper_step.mapper_body) runs INSIDE this
    # dispatch — its tri/BA wires rode this window's upload, its result rides
    # this window's result wire, and its patch freshens this window's
    # snapshot — zero standalone transfers or dispatches on the serial
    # tunnel link. mtri row 0 col 30 carries the on/off flag (0 = no staged
    # job: the section computes garbage that the patch gating drops and the
    # host ignores). Pinned to the SMALL size class; BIG jobs (rare: local
    # problems beyond 32 KFs / 1024 points) still go through the standalone
    # mapper_step_wire program and patch via the patch_tri/patch_mp inputs.
    mwire = None
    if mtri is not None:
        m_on = mtri[0, 30] > 0
        mout = mapper_body(
            mtri, mba, intr, dist_pack[9] if dist_pack is not None else 0.0,
            K=MAPPER_SMALL["K"], P=MAPPER_SMALL["P"], O=MAPPER_SMALL["O"],
        )
        mwire = mout["wire"]
        patch_tri = jnp.where(m_on, mout["patch_tri"], patch_tri)
        patch_mp = jnp.where(m_on, mout["patch_mp"], patch_mp)

    # Device-side snapshot patch (pending deferred-mapper results) + ONE
    # sort for the whole window (core/snapshot.py uploads ids in row order).
    if patch_tri is not None:
        snap_fused = _apply_patch(snap_fused, patch_tri, patch_mp, patch_meta)
    snap = prep_snapshot(snap_fused)

    last_R = pose_pack[0:9].reshape(3, 3)
    last_t = pose_pack[9:12]
    vel_R = pose_pack[12:21].reshape(3, 3)
    vel_t = pose_pack[21:24]
    has_vel = pose_pack[24] > 0

    def body(carry, xs):
        state, p_img, k, l_R, l_t, v_R, v_t, h_v = carry
        if has_stereo:
            img, mvk_i16, img_r = xs
        else:
            img, mvk_i16 = xs
            img_r = None
        coverage_area = mvk_i16[-1, 0].astype(jnp.float32) * (1.0 / 16384.0)
        mvk = mvk_i16[:-1].astype(jnp.float32)
        mv_pack = jnp.concatenate(
            [mvk[:n_mvs, 0:2] * (1.0 / 64.0), mvk[:n_mvs, 2:8]], axis=1
        )
        kps_pack = mvk[n_mvs:, 0:5]

        # Constant-velocity prior (Tracking.cc:414-424): T_prior = T_vel *
        # T_last when a velocity exists, else T_last.
        prior_R = jnp.where(h_v, v_R @ l_R, l_R)
        prior_t = jnp.where(h_v, v_R @ l_t + v_t, l_t)

        k, sub = jax.random.split(k)
        new_state, packed, scalars, snap_visible, R2, t2, chain_ok = (
            _frame_program_body(
                img, p_img, state, mv_pack, kps_pack, coverage_area,
                prior_R, prior_t, snap,
                intr, sub, dist_pack, img_r,
                reproj_err=reproj_err, threshold=threshold,
                coverage_threshold=coverage_threshold, capacity=capacity,
                max_cov=max_cov, has_dist=has_dist, has_stereo=has_stereo,
            )
        )
        # Pose chain mirrors the host replay: on ref-gate/solve failure the
        # frame keeps the previous pose (track_fused failure branch).
        R_cur = jnp.where(chain_ok, R2, l_R)
        t_cur = jnp.where(chain_ok, t2, l_t)
        # Velocity = T_cur * T_last^-1 (identity when the pose held still).
        v_R_new = R_cur @ l_R.T
        v_t_new = t_cur - v_R_new @ l_t
        carry_out = (
            new_state, img, k, R_cur, t_cur, v_R_new, v_t_new,
            jnp.asarray(True),
        )
        from .frame_step import pack_bits_i32

        ys = (packed, scalars, pack_bits_i32(snap_visible), new_state.desc)
        return carry_out, ys

    carry0 = (prev_state, prev_img, key, last_R, last_t, vel_R, vel_t, has_vel)
    xs = (imgs, mvk_packs, imgs_right) if has_stereo else (imgs, mvk_packs)
    carry, (packed_w, scalars_w, visbits_w, desc_w) = jax.lax.scan(
        body, carry0, xs
    )
    state_out, _, key_out = carry[0], carry[1], carry[2]
    # Device-resident pose-chain exit point: lets the host dispatch the NEXT
    # window speculatively (pipelined drive) without pulling this window's
    # results first — same layout as the pose_pack input.
    pose_carry = jnp.concatenate(
        [
            carry[3].reshape(-1), carry[4],            # last pose
            carry[5].reshape(-1), carry[6],            # velocity
            carry[7].astype(jnp.float32)[None],        # has_vel
        ]
    )

    # The wire is INT32 end to end (float payloads as bitcast bits): f32
    # lanes carrying integer bit patterns are denormals the TPU VPU flushes
    # to zero whenever fusion routes the export through vector registers
    # (see ops/frame_step.packed_cols).
    parts = [
        packed_w.reshape(-1),                       # W*N*packed_cols (i32)
        scalars_w.reshape(-1),                      # W*16 (i32; pose bits)
        visbits_w.reshape(-1),                      # W*P/32 (u32 bits)
        # NO descriptors on the wire: the keyframe archive pulls its row
        # LAZILY from the desc_w side channel (async D2H kicked off at the
        # KF replay, materialized only if a consumer reads it) — all W
        # frames' descriptors would cost 524 KB of the scarce ~10-30 MB/s
        # D2H link, and even one frame's 32 KB is ~15% of the pull.
    ]
    if mwire is not None:
        # Fused mapper result (f32) rides as bit patterns.
        parts.append(jax.lax.bitcast_convert_type(mwire, jnp.int32))
    wire = jnp.concatenate(parts)
    return {
        "state": state_out,
        "key": key_out,
        "wire": wire,
        # Device-resident side channels: per-frame descriptors (pulled only
        # when a keyframe forms) and the packed stack (mid-window rewinds
        # rebuild the TrackState on device).
        "desc_w": desc_w,
        "packed_w": packed_w,
        "pose_carry": pose_carry,
    }
