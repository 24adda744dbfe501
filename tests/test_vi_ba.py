"""Joint visual-inertial bundle adjustment (ops/vi_ba).

Synthetic rig: keyframes on an analytic trajectory, landmarks observed
noise-free, IMU samples generated exactly from the trajectory dynamics.
The solver must (1) pull perturbed states back to ground truth and
(2) recover METRIC SCALE from the inertial terms — the observability that
pure visual BA fundamentally lacks (reference's dormant EdgeInertial
machinery, G2oTypes.h:522-666)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from movslam_tpu.ops.ba import build_obs_by_point
from movslam_tpu.ops.imu import GRAVITY, preintegrate
from movslam_tpu.ops.vi_ba import vi_ba_solve

FX = FY = 200.0
CX, CY = 160.0, 120.0


AMP = np.array([0.5, 0.35, 0.25])
OMG = np.array([3.1, 4.3, 2.2])  # rad/s, distinct per axis


def _pos(t):
    return AMP * np.sin(OMG * t)


def _vel(t):
    return AMP * OMG * np.cos(OMG * t)


def _acc(t):
    return -AMP * OMG * OMG * np.sin(OMG * t)


def _trajectory(K=6, dt_kf=0.3):
    """Analytic world trajectory: sinusoidal translation (time-varying
    acceleration — REQUIRED for scale/bias separability; constant world
    acceleration is exactly absorbed by a constant accelerometer bias),
    no rotation. Returns times, R_wb (K,3,3), p (K,3), v (K,3)."""
    times = np.arange(K) * dt_kf
    R = np.tile(np.eye(3), (K, 1, 1))
    p = np.stack([_pos(t) for t in times])
    v = np.stack([_vel(t) for t in times])
    return times, R, p, v


def _imu_windows(times, hz=200.0, gyro_bias=None):
    """Exact IMU for each consecutive window: R_wb = I so
    acc_body = a_w(t) - g, gyro = 0 (+optional constant bias). Samples the
    acceleration at interval midpoints (2nd-order accurate under the
    preintegrator's Euler scheme)."""
    g = np.asarray(GRAVITY)
    winds = []
    for k in range(len(times) - 1):
        n = int(round((times[k + 1] - times[k]) * hz))
        dt = (times[k + 1] - times[k]) / n
        t_mid = times[k] + (np.arange(n) + 0.5) * dt
        dts = np.full(n, dt, np.float32)
        gyro = np.zeros((n, 3), np.float32)
        if gyro_bias is not None:
            gyro += gyro_bias
        acc = np.stack([_acc(t) - g for t in t_mid]).astype(np.float32)
        winds.append((gyro, acc, dts))
    cap = max(len(w[2]) for w in winds)
    E = len(winds)
    G = np.zeros((E, cap, 3), np.float32)
    A = np.zeros((E, cap, 3), np.float32)
    D = np.zeros((E, cap), np.float32)
    V = np.zeros((E, cap), bool)
    for e, (gy, ac, dts) in enumerate(winds):
        n = len(dts)
        G[e, :n], A[e, :n], D[e, :n], V[e, :n] = gy, ac, dts, True
    zero = jnp.zeros(3)
    pres = jax.vmap(
        lambda g_, a_, d_, v_: preintegrate(g_, a_, d_, v_, zero, zero)
    )(jnp.asarray(G), jnp.asarray(A), jnp.asarray(D), jnp.asarray(V))
    return pres


def _scene(K=6, P=48, seed=0):
    times, R_wb, p, v = _trajectory(K)
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, (P, 3))
    X[:, 2] += 6.0  # in front of every camera

    # camera-from-world: R_cw = R_wb^T, t_cw = -R_cw p
    kf_R = np.transpose(R_wb, (0, 2, 1)).astype(np.float32)
    kf_t = np.stack([-(kf_R[k] @ p[k]) for k in range(K)]).astype(np.float32)

    O = K * P
    obs_kf = np.repeat(np.arange(K), P).astype(np.int32)
    obs_mp = np.tile(np.arange(P), K).astype(np.int32)
    pc = np.einsum("oij,oj->oi", kf_R[obs_kf], X[obs_mp]) + kf_t[obs_kf]
    uv = np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
    ).astype(np.float32)
    obs_valid = np.ones(O, bool)
    obp = build_obs_by_point(obs_mp, P, K, O)
    pres = _imu_windows(times)
    return dict(
        times=times, kf_R=kf_R, kf_t=kf_t, v=v.astype(np.float32),
        X=X.astype(np.float32), obs_kf=obs_kf, obs_mp=obs_mp, obs_uv=uv,
        obs_valid=obs_valid, obp=obp, pres=pres, K=K, P=P,
    )


def _solve(sc, kf_R, kf_t, v, X, bg=None, ba=None, iters=12):
    K, P = sc["K"], sc["P"]
    E = K - 1
    z3 = np.zeros((K, 3), np.float32)
    res = vi_ba_solve(
        jnp.asarray(kf_R), jnp.asarray(kf_t),
        jnp.asarray(np.arange(K) == 0),  # fix first KF (gauge)
        jnp.ones(K, bool),
        jnp.asarray(v),
        jnp.asarray(bg if bg is not None else z3),
        jnp.asarray(ba if ba is not None else z3),
        jnp.asarray(X), jnp.ones(P, bool),
        jnp.asarray(sc["obs_kf"]), jnp.asarray(sc["obs_mp"]),
        jnp.asarray(sc["obs_uv"]), jnp.asarray(sc["obs_valid"]),
        jnp.asarray(sc["obp"]),
        sc["pres"], jnp.ones(E, bool),
        jnp.zeros((E, 3)), jnp.zeros((E, 3)),
        FX, FY, CX, CY,
        kf_vb_fixed=jnp.zeros(K, bool),  # gauge KF pose pinned, its v/b free
        iters=iters,
    )
    return jax.device_get(res)


def test_vi_ba_converges_from_perturbation():
    sc = _scene()
    rng = np.random.default_rng(3)
    K = sc["K"]
    kf_t = sc["kf_t"].copy()
    kf_t[1:] += rng.normal(0, 0.05, (K - 1, 3)).astype(np.float32)
    v = sc["v"] + rng.normal(0, 0.1, (K, 3)).astype(np.float32)
    X = sc["X"] + rng.normal(0, 0.05, sc["X"].shape).astype(np.float32)

    res = _solve(sc, sc["kf_R"], kf_t, v, X)
    assert np.all(np.isfinite(res["kf_t"]))
    t_err = np.linalg.norm(res["kf_t"] - sc["kf_t"], axis=1)
    assert t_err.max() < 5e-3, t_err
    v_err = np.linalg.norm(res["kf_v"] - sc["v"], axis=1)
    assert v_err[:-1].max() < 0.05, v_err
    assert np.abs(res["kf_bg"]).max() < 1e-2
    # final visual cost ~ 0 (noise-free observations)
    assert res["cost"] < 1e-1


def test_vi_ba_recovers_metric_scale():
    """Scale the whole visual solution by 1.25 (visually unobservable) and
    hand the solver consistently-scaled velocities: only the inertial terms
    can know the true metric. Inter-KF distances must return to metric."""
    sc = _scene()
    s = 1.25
    kf_t = (sc["kf_t"] * s).astype(np.float32)
    X = (sc["X"] * s).astype(np.float32)
    v = (sc["v"] * s).astype(np.float32)

    res = _solve(sc, sc["kf_R"], kf_t, v, X, iters=16)

    def centers(kf_R, kf_t):
        return np.stack(
            [-(kf_R[k].T @ kf_t[k]) for k in range(sc["K"])]
        )

    c_gt = centers(sc["kf_R"], sc["kf_t"])
    c_est = centers(np.asarray(res["kf_R"]), np.asarray(res["kf_t"]))
    d_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=1)
    d_est = np.linalg.norm(np.diff(c_est, axis=0), axis=1)
    ratio = d_est / d_gt
    # started at 1.25; inertial residuals must pull it to ~1
    assert np.abs(ratio - 1.0).max() < 0.05, ratio


def test_vi_ba_estimates_gyro_bias():
    """A constant gyro bias baked into the preintegration windows must be
    picked up by the bias states (residuals are bias-corrected, EdgeInertial
    + EdgeGyroRW)."""
    sc = _scene()
    bias_true = np.array([0.02, -0.015, 0.01], np.float32)
    pres = _imu_windows(sc["times"], gyro_bias=bias_true)
    sc2 = dict(sc, pres=pres)

    res = _solve(sc2, sc["kf_R"], sc["kf_t"], sc["v"], sc["X"], iters=16)
    bg = np.asarray(res["kf_bg"])
    # every free keyframe's gyro-bias state should approach the true bias
    assert np.abs(bg[1:] - bias_true).max() < 5e-3, bg
