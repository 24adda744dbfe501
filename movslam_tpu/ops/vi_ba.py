"""Visual-inertial local bundle adjustment (JAX, TPU-first).

The live VI back end the reference defines types for but never runs:
EdgeInertial + EdgeGyroRW/EdgeAccRW between consecutive keyframe states
(/root/reference/include/G2oTypes.h:522-666, ImuTypes.h:139-249) jointly
optimized with the visual reprojection edges — ORB-SLAM3's LocalInertialBA
shape, built here as ONE jitted LM program:

  - per-keyframe state: camera-from-world pose (6), world velocity (3),
    gyro bias (3), accelerometer bias (3) -> 15-dim blocks.
  - landmarks are marginalized exactly as in ops/ba.ba_solve (shared
    schur_reduce); the reduced camera system is embedded into the pose
    slices of the (K*15, K*15) full system.
  - each consecutive-keyframe preintegration window contributes a 9-dim
    inertial residual (rot/vel/pos, Forster) plus a 6-dim bias
    random-walk residual, whitened by the inverse preintegration
    covariance; Jacobians come from forward-mode autodiff of the
    residual at the zero perturbation (idiomatic JAX — the edges are few
    and tiny, the MXU work is all in the visual side).
  - branchless LM (accept/reject via jnp.where), fixed iteration count,
    one XLA program for the whole solve.

Pose perturbations are left-multiplicative on T_cw, matching ba_solve, so
the visual Schur blocks and the autodiff inertial blocks live in the same
tangent space.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ba import (
    _residual_jacobians,
    _total_cost,
    backsub_landmarks,
    schur_reduce,
)
from .imu import GRAVITY, bias_corrected_deltas
from .lie import se3_compose, se3_exp, so3_log
from .linalg import solve_psd

# Per-edge cap on the whitening scale (see _edge_residual).
SQRT_INFO_CAP = 1e3


def _edge_residual(dx, pre, pose_i, pose_j, bg0, ba0, gravity):
    """Whitened 15-dim inertial+bias-RW residual of one keyframe pair as a
    function of the 30-dim (dx_i, dx_j) perturbation — autodiffed at zero.

    pose_* = (R_cw, t_cw, v, bg, ba); bg0/ba0 = bias at integration time."""
    def perturb(d, pose):
        R_cw, t_cw, v, bg, ba = pose
        dR, dt = se3_exp(d[:6])
        R_c, t_c = se3_compose(dR, dt, R_cw, t_cw)
        return R_c, t_c, v + d[6:9], bg + d[9:12], ba + d[12:15]

    R_ci, t_ci, v_i, bg_i, ba_i = perturb(dx[:15], pose_i)
    R_cj, t_cj, v_j, bg_j, ba_j = perturb(dx[15:], pose_j)

    # world-from-body states (camera == body; see core/inertial.py)
    Rwb_i, p_i = R_ci.T, -(R_ci.T @ t_ci)
    Rwb_j, p_j = R_cj.T, -(R_cj.T @ t_cj)

    dt = pre["dt"]
    dR, dv, dp = bias_corrected_deltas(pre, bg_i - bg0, ba_i - ba0)
    er = so3_log(dR.T @ (Rwb_i.T @ Rwb_j))
    ev = Rwb_i.T @ (v_j - v_i - gravity * dt) - dv
    ep = Rwb_i.T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp
    r9 = jnp.concatenate([er, ev, ep])

    # sqrt-information whitening from the preintegration covariance
    # (rot, vel, pos ordering matches ImuTypes / ops.imu.preintegrate).
    # The raw sqrt-info reaches ~1e4-1e5 for short quiet windows; the g2o
    # reference absorbs that in double precision, but an f32 normal-equation
    # solve loses the visual blocks (~1e3) entirely next to 1e10 inertial
    # diagonals. Cap each edge's whitening by a scalar (direction/correlation
    # structure preserved) to keep the joint system f32-conditioned.
    cov9 = pre["cov"][0:9, 0:9] + 1e-9 * jnp.eye(9)
    info9 = jnp.linalg.inv(cov9)
    L9 = jnp.linalg.cholesky(0.5 * (info9 + info9.T))
    c9 = jnp.minimum(1.0, SQRT_INFO_CAP / jnp.maximum(jnp.max(jnp.abs(L9)), 1e-12))
    r9w = c9 * (L9.T @ r9)

    # bias random walk (EdgeGyroRW / EdgeAccRW, G2oTypes.h:641-698)
    cov_bg = pre["cov"][9:12, 9:12] + 1e-12 * jnp.eye(3)
    cov_ba = pre["cov"][12:15, 12:15] + 1e-12 * jnp.eye(3)
    Lg = jnp.linalg.cholesky(jnp.linalg.inv(cov_bg))
    La = jnp.linalg.cholesky(jnp.linalg.inv(cov_ba))
    cg = jnp.minimum(1.0, SQRT_INFO_CAP / jnp.maximum(jnp.max(jnp.abs(Lg)), 1e-12))
    ca = jnp.minimum(1.0, SQRT_INFO_CAP / jnp.maximum(jnp.max(jnp.abs(La)), 1e-12))
    rw = jnp.concatenate(
        [cg * (Lg.T @ (bg_j - bg_i)), ca * (La.T @ (ba_j - ba_i))]
    )
    return jnp.concatenate([r9w, rw])


@functools.partial(jax.jit, static_argnames=("iters",))
def vi_ba_solve(
    kf_R,
    kf_t,
    kf_fixed,
    kf_valid,
    kf_v,
    kf_bg,
    kf_ba,
    mp_pos,
    mp_valid,
    obs_kf,
    obs_mp,
    obs_uv,
    obs_valid,
    obs_by_point,
    pres,
    pre_valid,
    pre_bg0,
    pre_ba0,
    fx,
    fy,
    cx,
    cy,
    obs_ur=None,
    bf=0.0,
    gravity=GRAVITY,
    kf_vb_fixed=None,
    iters=10,
):
    """Joint visual-inertial LM bundle adjustment.

    Visual inputs are exactly ba_solve's. Inertial inputs:
      kf_v/kf_bg/kf_ba : (K, 3) per-keyframe velocity (world) and biases
      pres             : preintegration dict stacked over the K-1
                         consecutive-keyframe windows (vmapped layout)
      pre_valid        : (K-1,) window mask
      pre_bg0/pre_ba0  : (K-1, 3) bias each window was integrated at

    kf_vb_fixed masks velocity/bias updates separately from poses: the
    gauge-fixed first keyframe usually keeps its pose pinned while its
    velocity and biases stay free (fixing them would propagate a stale bias
    through the high-information random-walk chain). Defaults to kf_fixed.

    Returns dict(kf_R, kf_t, kf_v, kf_bg, kf_ba, mp_pos, chi2, depth,
    cost, costs)."""
    K = kf_R.shape[0]
    P = mp_pos.shape[0]
    O = obs_kf.shape[0]
    E = K - 1

    free = kf_valid & ~kf_fixed  # (K,) pose dims
    if kf_vb_fixed is None:
        kf_vb_fixed = kf_fixed
    free_vb = kf_valid & ~kf_vb_fixed  # (K,) velocity/bias dims
    obs_w = obs_valid.astype(jnp.float32) * mp_valid[obs_mp] * kf_valid[obs_kf]
    any_free = free | free_vb
    edge_w = (
        pre_valid & kf_valid[:-1] & kf_valid[1:] & (any_free[:-1] | any_free[1:])
    ).astype(jnp.float32)

    i_idx = jnp.arange(E)
    j_idx = i_idx + 1

    def inertial_linearize(R, t, v, bg, ba):
        """Vmapped residuals + autodiff Jacobians of all K-1 edges at the
        zero perturbation. Returns r (E, 15), J (E, 15, 30)."""

        def one(pre, Ri, ti, vi, bgi, bai, Rj, tj, vj, bgj, baj, bg0, ba0):
            f = lambda d: _edge_residual(
                d, pre, (Ri, ti, vi, bgi, bai), (Rj, tj, vj, bgj, baj),
                bg0, ba0, gravity,
            )
            z = jnp.zeros(30)
            return f(z), jax.jacfwd(f)(z)

        return jax.vmap(one)(
            pres,
            R[i_idx], t[i_idx], v[i_idx], bg[i_idx], ba[i_idx],
            R[j_idx], t[j_idx], v[j_idx], bg[j_idx], ba[j_idx],
            pre_bg0, pre_ba0,
        )

    def visual_linearize(R, t, X):
        r, Jp, Jl, w, chi2, z = _residual_jacobians(
            R, t, X, obs_kf, obs_mp, obs_uv, obs_w, fx, fy, cx, cy, obs_ur, bf
        )
        Jp = Jp * free[obs_kf][:, None, None]
        Jpw = Jp * w[:, None, None]
        Jlw = Jl * w[:, None, None]
        g_p = -jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Jpw, r), obs_kf, num_segments=K
        )
        g_l = -jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", Jlw, r), obs_mp, num_segments=P
        )
        Hpp = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", Jpw, Jp), obs_kf, num_segments=K
        )
        Hll = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", Jlw, Jl), obs_mp, num_segments=P
        )
        W = jnp.einsum("oij,oik->ojk", Jpw, Jl)
        cost = _total_cost(chi2, obs_w)
        return W, g_p, g_l, Hpp, Hll, cost, chi2, z

    def total_cost(R, t, X, v, bg, ba):
        _, _, _, _, _, cvis, _, _ = visual_linearize(R, t, X)
        r_in, _ = inertial_linearize(R, t, v, bg, ba)
        return cvis + jnp.sum(jnp.sum(r_in * r_in, -1) * edge_w)

    # index map: pose dims of keyframe k live at [k*15, k*15+6)
    pose_slots = (jnp.arange(K)[:, None] * 15 + jnp.arange(6)[None, :]).reshape(-1)

    def solve(R, t, X, v, bg, ba, lam):
        W, g_p, g_l, Hpp, Hll, cvis0, _, _ = visual_linearize(R, t, X)
        S6, rhs6, Hll_inv = schur_reduce(
            W, g_p, g_l, Hpp, Hll, obs_kf, obs_mp, obs_by_point, lam, K, P, O
        )

        r_in, J_in = inertial_linearize(R, t, v, bg, ba)
        cin0 = jnp.sum(jnp.sum(r_in * r_in, -1) * edge_w)
        Jw = J_in * edge_w[:, None, None]
        J_i = Jw[:, :, :15]  # (E, 15, 15)
        J_j = Jw[:, :, 15:]

        # block contributions (E, 15, 15) scattered into the (K, K) grid
        H_ii = jnp.einsum("eri,erj->eij", J_i, J_i)
        H_ij = jnp.einsum("eri,erj->eij", J_i, J_j)
        H_ji = jnp.swapaxes(H_ij, -1, -2)
        H_jj = jnp.einsum("eri,erj->eij", J_j, J_j)
        blocks = jnp.concatenate([H_ii, H_ij, H_ji, H_jj], axis=0)
        seg = jnp.concatenate(
            [
                i_idx * K + i_idx,
                i_idx * K + j_idx,
                j_idx * K + i_idx,
                j_idx * K + j_idx,
            ]
        )
        Hb = jax.ops.segment_sum(blocks, seg, num_segments=K * K)
        H = (
            Hb.reshape(K, K, 15, 15)
            .transpose(0, 2, 1, 3)
            .reshape(K * 15, K * 15)
        )

        b_i = -jnp.einsum("eri,er->ei", J_i, r_in)
        b_j = -jnp.einsum("eri,er->ei", J_j, r_in)
        b = (
            jax.ops.segment_sum(
                jnp.concatenate([b_i, b_j], 0),
                jnp.concatenate([i_idx, j_idx]),
                num_segments=K,
            )
        ).reshape(-1)

        # embed the visual reduced system into the pose slices
        H = H.at[pose_slots[:, None], pose_slots[None, :]].add(S6)
        b = b.at[pose_slots].add(rhs6.reshape(-1))

        # damping on the non-pose dims (pose dims carry lam via schur_reduce)
        vb_mask = jnp.tile(
            jnp.concatenate([jnp.zeros(6), jnp.ones(9)]), K
        )
        H = H + jnp.diag(vb_mask * lam + 1e-8)

        # fixed/invalid keyframes: identity rows/cols, zero rhs (pose dims
        # masked by `free`, velocity/bias dims by `free_vb`)
        m = jnp.concatenate(
            [
                jnp.broadcast_to(free[:, None], (K, 6)),
                jnp.broadcast_to(free_vb[:, None], (K, 9)),
            ],
            axis=1,
        ).reshape(-1).astype(jnp.float32)
        H = H * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        b = b * m

        # SPD Cholesky solve; NaNs on a borderline system zero dx below and
        # the LM acceptance rejects the (no-op) step, raising lambda.
        dx = solve_psd(H + 1e-6 * jnp.eye(K * 15), b).reshape(K, 15)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        dxi = dx[:, :6]
        dX = backsub_landmarks(dxi, W, Hll_inv, g_l, obs_kf, obs_mp, P, mp_valid)

        dR, dt_ = se3_exp(dxi)
        R_new, t_new = se3_compose(dR, dt_, R, t)
        R_new = jnp.where(free[:, None, None], R_new, R)
        t_new = jnp.where(free[:, None], t_new, t)
        fvb = free_vb[:, None]
        v_new = jnp.where(fvb, v + dx[:, 6:9], v)
        bg_new = jnp.where(fvb, bg + dx[:, 9:12], bg)
        ba_new = jnp.where(fvb, ba + dx[:, 12:15], ba)
        X_new = X + dX

        cost0 = cvis0 + cin0
        cost1 = total_cost(R_new, t_new, X_new, v_new, bg_new, ba_new)
        return (R_new, t_new, X_new, v_new, bg_new, ba_new), cost0, cost1

    def lm_step(carry, _):
        (R, t, X, v, bg, ba), lam = carry
        new_state, cost0, cost1 = solve(R, t, X, v, bg, ba, lam)
        accept = (cost1 < cost0) & jnp.isfinite(cost1)
        state = jax.tree.map(
            lambda n, o: jnp.where(
                jnp.reshape(accept, (1,) * n.ndim), n, o
            ),
            new_state,
            (R, t, X, v, bg, ba),
        )
        lam = jnp.clip(
            jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e6
        )
        return (state, lam), cost1

    init = ((kf_R, kf_t, mp_pos, kf_v, kf_bg, kf_ba), jnp.asarray(1e-4, jnp.float32))
    ((R, t, X, v, bg, ba), _), costs = jax.lax.scan(
        lm_step, init, None, length=iters
    )

    # final per-observation chi2/depth for host-side pruning
    r, _, _, _, chi2, z = _residual_jacobians(
        R, t, X, obs_kf, obs_mp, obs_uv, obs_w, fx, fy, cx, cy, obs_ur, bf
    )
    return {
        "kf_R": R,
        "kf_t": t,
        "kf_v": v,
        "kf_bg": bg,
        "kf_ba": ba,
        "mp_pos": X,
        "chi2": chi2,
        "depth": z,
        "cost": _total_cost(chi2, obs_w),
        "costs": costs,
    }
