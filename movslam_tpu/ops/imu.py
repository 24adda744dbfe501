"""IMU preintegration (Forster et al.) in JAX — batched over measurements.

TPU-native equivalent of the reference's dormant inertial machinery
(/root/reference/include/ImuTypes.h:139-258: Preintegrated with ΔR/ΔV/ΔP,
15x15 covariance, bias Jacobians, IntegrateNewMeasurement/Reintegrate/
MergePrevious; the reference plumbs these through Frame/KeyFrame/Tracking
but never feeds them — no GrabImuData call sites exist). Here the
preintegration over a window of measurements is one `lax.scan`, making the
whole window a single device program, and the bias-corrected deltas are
differentiable for use as inertial residuals in the batched LM back-end.

State per window: dR (3,3), dv (3,), dp (3,), dt, bias Jacobians
(JRg, Jvg, Jva, Jpg, Jpa), and the 15x15 covariance (order: rot, vel, pos,
gyro bias, acc bias — like ImuTypes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lie import hat, so3_exp, so3_log

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def _right_jacobian(phi):
    """SO(3) right Jacobian (ImuTypes.h:252-258)."""
    theta2 = jnp.sum(phi * phi)
    theta = jnp.sqrt(theta2 + 1e-12)
    K = hat(phi)
    K2 = K @ K
    a = jnp.where(theta2 > 1e-8, (1.0 - jnp.cos(theta)) / theta2, 0.5)
    b = jnp.where(
        theta2 > 1e-8, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0
    )
    return jnp.eye(3) - a * K + b * K2


@functools.partial(jax.jit, static_argnames=())
def preintegrate(gyro, acc, dts, valid, bias_g, bias_a, sigma_g=1.7e-4, sigma_a=2e-3,
                 sigma_bg=1e-5, sigma_ba=1e-4):
    """Preintegrate a window of IMU samples (one lax.scan).

    gyro/acc: (N, 3); dts: (N,); valid: (N,) bool mask (padding);
    bias_g/bias_a: (3,) current bias estimates.

    Returns dict(dR, dv, dp, dt, JRg, Jvg, Jva, Jpg, Jpa, cov (15,15)).
    Mirrors Preintegrated::IntegrateNewMeasurement (ImuTypes.cc) semantics:
    position/velocity integrated with the pre-update rotation, covariance
    propagated with the standard A/B discrete model."""

    def body(carry, x):
        dR, dv, dp, dt_acc, JRg, Jvg, Jva, Jpg, Jpa, cov = carry
        w, a, dt, ok = x
        dt = jnp.where(ok, dt, 0.0)

        acc_c = a - bias_a
        w_c = w - bias_g

        # position/velocity with pre-update rotation
        dp_new = dp + dv * dt + 0.5 * (dR @ acc_c) * dt * dt
        dv_new = dv + (dR @ acc_c) * dt

        # bias Jacobians (ImuTypes.cc IntegrateNewMeasurement order)
        acc_hat = hat(acc_c)
        Jpa_new = Jpa + Jva * dt - 0.5 * dR * dt * dt
        Jpg_new = Jpg + Jvg * dt - 0.5 * (dR @ acc_hat) @ JRg * dt * dt
        Jva_new = Jva - dR * dt
        Jvg_new = Jvg - (dR @ acc_hat) @ JRg * dt

        phi = w_c * dt
        dRi = so3_exp(phi)
        Jr = _right_jacobian(phi)
        dR_new = dR @ dRi
        JRg_new = dRi.T @ JRg - Jr * dt

        # covariance propagation (15x15; rot, vel, pos, bg, ba)
        A = jnp.eye(15)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dR @ acc_hat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ acc_hat * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        B = jnp.zeros((15, 6))
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        Nq = jnp.diag(
            jnp.concatenate([jnp.full(3, sigma_g**2), jnp.full(3, sigma_a**2)])
        )
        cov_new = A @ cov @ A.T + B @ Nq @ B.T
        cov_new = cov_new.at[9:12, 9:12].add(jnp.eye(3) * sigma_bg**2 * dt)
        cov_new = cov_new.at[12:15, 12:15].add(jnp.eye(3) * sigma_ba**2 * dt)

        sel = ok

        def keep(new, old):
            return jnp.where(sel, new, old)

        carry = (
            keep(dR_new, dR), keep(dv_new, dv), keep(dp_new, dp),
            dt_acc + dt,
            keep(JRg_new, JRg), keep(Jvg_new, Jvg), keep(Jva_new, Jva),
            keep(Jpg_new, Jpg), keep(Jpa_new, Jpa), keep(cov_new, cov),
        )
        return carry, None

    init = (
        jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.asarray(0.0),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((3, 3)),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), jnp.zeros((15, 15)),
    )
    xs = (gyro, acc, dts, valid)
    (dR, dv, dp, dt, JRg, Jvg, Jva, Jpg, Jpa, cov), _ = jax.lax.scan(body, init, xs)
    return {
        "dR": dR, "dv": dv, "dp": dp, "dt": dt,
        "JRg": JRg, "Jvg": Jvg, "Jva": Jva, "Jpg": Jpg, "Jpa": Jpa,
        "cov": cov,
    }


def bias_corrected_deltas(pre, dbg, dba):
    """First-order bias update of the preintegrated deltas
    (Preintegrated::GetDeltaRotation/Velocity/Position(bias))."""
    dR = pre["dR"] @ so3_exp(pre["JRg"] @ dbg)
    dv = pre["dv"] + pre["Jvg"] @ dbg + pre["Jva"] @ dba
    dp = pre["dp"] + pre["Jpg"] @ dbg + pre["Jpa"] @ dba
    return dR, dv, dp


def inertial_residual(pre, R_i, p_i, v_i, R_j, p_j, v_j, bias_g, bias_a,
                      bias_g0, bias_a0, gravity=GRAVITY):
    """9-dim inertial residual between two states (EdgeInertial,
    /root/reference/include/G2oTypes.h:522-566 semantics).

    States are world-frame body poses (R = world-from-body)."""
    dt = pre["dt"]
    dR, dv, dp = bias_corrected_deltas(pre, bias_g - bias_g0, bias_a - bias_a0)
    er = so3_log(dR.T @ (R_i.T @ R_j))
    ev = R_i.T @ (v_j - v_i - gravity * dt) - dv
    ep = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * gravity * dt * dt) - dp
    return jnp.concatenate([er, ev, ep])


def _exp_xy(theta):
    """Gravity-direction rotation from a 2-DoF tangent (VertexGDir semantics,
    G2oTypes.h: GDirection updates only roll/pitch — yaw is unobservable)."""
    return so3_exp(jnp.concatenate([theta, jnp.zeros(1)]))


@functools.partial(jax.jit, static_argnames=("iters",))
def inertial_gs_optimize(pres, Rs, ps, v0, bg0, ba0, valid, iters=30,
                         gravity_mag=9.81, prior_bias=1e2):
    """Gravity-direction + scale (+ velocities, shared biases) optimization
    with all keyframe poses fixed — Optimizer::InertialOptimization
    (/root/reference/src/Optimizer.cc:843-950, EdgeInertialGS semantics;
    vestigial there: only reachable from the never-called
    LocalMapping::ScaleRefinement at LocalMapping.cc:804-857).

    pres:  preintegration windows stacked over the leading axis (K-1 windows,
           each field as from `preintegrate`, vmapped layout).
    Rs:    (K, 3, 3) world-from-body rotations (fixed).
    ps:    (K, 3) keyframe positions in the (unscaled) map frame (fixed).
    v0:    (K, 3) initial velocity guesses.
    valid: (K-1,) window mask.

    Optimizes x = [theta_g (2), log_s, v (K*3), bg (3), ba (3)] by damped
    Gauss-Newton on the stacked 9-dim residuals
        er = Log(dR(bg)^T R_i^T R_j)
        ev = R_i^T (v_j - v_i - g dt) - dv(bg, ba)
        ep = R_i^T (s (p_j - p_i) - v_i dt - 0.5 g dt^2) - dp(bg, ba)
    with g = Exp([theta_g, 0]) [0, 0, -gravity_mag]. Returns dict with
    Rwg, scale, vel, bg, ba, cost history."""
    K = Rs.shape[0]
    g0 = jnp.array([0.0, 0.0, -gravity_mag])

    def unpack(x):
        theta = x[0:2]
        log_s = x[2]
        v = x[3 : 3 + 3 * K].reshape(K, 3)
        bg = x[3 + 3 * K : 6 + 3 * K]
        ba = x[6 + 3 * K : 9 + 3 * K]
        return theta, log_s, v, bg, ba

    def residuals(x):
        theta, log_s, v, bg, ba = unpack(x)
        g = _exp_xy(theta) @ g0
        s = jnp.exp(log_s)

        def window(pre, R_i, p_i, v_i, R_j, p_j, v_j, w_valid):
            dt = pre["dt"]
            dR, dv, dp = bias_corrected_deltas(pre, bg - bg0, ba - ba0)
            er = so3_log(dR.T @ (R_i.T @ R_j))
            ev = R_i.T @ (v_j - v_i - g * dt) - dv
            ep = R_i.T @ (s * (p_j - p_i) - v_i * dt - 0.5 * g * dt * dt) - dp
            r = jnp.concatenate([er, ev, ep])
            return jnp.where(w_valid, r, 0.0)

        r = jax.vmap(window)(
            pres, Rs[:-1], ps[:-1], v[:-1], Rs[1:], ps[1:], v[1:], valid
        ).reshape(-1)
        # Gentle bias prior (EdgePriorGyro/Acc, Optimizer.cc:901-917).
        r_prior = jnp.concatenate([bg - bg0, ba - ba0]) * jnp.sqrt(
            1.0 / prior_bias
        )
        return jnp.concatenate([r, r_prior])

    x0 = jnp.concatenate(
        [jnp.zeros(2), jnp.zeros(1), v0.reshape(-1), bg0, ba0]
    )

    def lm_step(carry, _):
        x, lam = carry
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J
        # Levenberg-Marquardt damping: pure GN overshoots here (the scale
        # enters as exp(log_s) — strongly nonlinear) and every step gets
        # rejected, so the solve must adapt lam.
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-8)) + 1e-9 * jnp.eye(x.shape[0])
        dx = jnp.linalg.solve(Hd, -(J.T @ r))
        x_new = x + dx
        c0 = jnp.sum(r * r)
        c1 = jnp.sum(residuals(x_new) ** 2)
        ok = jnp.isfinite(c1) & (c1 < c0)
        x = jnp.where(ok, x_new, x)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-9, 1e8)
        return (x, lam), jnp.where(ok, c1, c0)

    (x, _), costs = jax.lax.scan(
        lm_step, (x0, jnp.asarray(1e-3)), None, length=iters
    )
    theta, log_s, v, bg, ba = unpack(x)
    return {
        "Rwg": _exp_xy(theta),
        "scale": jnp.exp(log_s),
        "vel": v,
        "bg": bg,
        "ba": ba,
        "costs": costs,
    }
