"""Pose-graph relaxation and IMU preintegration on synthetic data."""
import numpy as np
import jax
import jax.numpy as jnp

from movslam_tpu.ops import lie
from movslam_tpu.ops.posegraph import pose_graph_solve, relative_pose
from movslam_tpu.ops.imu import preintegrate, inertial_residual, GRAVITY


def _ring_poses(rng, K=12, noise=0.0):
    Rs, ts = [], []
    for k in range(K):
        ang = 2 * np.pi * k / K
        w = np.array([0, ang, 0]) + rng.normal(0, noise, 3)
        Rs.append(np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32))))
        ts.append(np.array([np.cos(ang), 0.1 * k, np.sin(ang)]) + rng.normal(0, noise, 3))
    return np.stack(Rs).astype(np.float32), np.stack(ts).astype(np.float32)


def test_pose_graph_closes_loop(rng):
    K = 12
    R_gt, t_gt = _ring_poses(rng, K)
    # Odometry edges + one loop edge, measured exactly; initialize with drift.
    ei, ej, eR, et = [], [], [], []
    for k in range(K - 1):
        Rm, tm = relative_pose(R_gt[k + 1], t_gt[k + 1], R_gt[k], t_gt[k])
        ei.append(k + 1); ej.append(k); eR.append(Rm); et.append(tm)
    Rm, tm = relative_pose(R_gt[0], t_gt[0], R_gt[K - 1], t_gt[K - 1])
    ei.append(0); ej.append(K - 1); eR.append(Rm); et.append(tm)

    R0 = R_gt.copy(); t0 = t_gt.copy()
    for k in range(1, K):  # accumulated drift
        dw = rng.normal(0, 0.02, 3).astype(np.float32) * k / K
        R0[k] = np.asarray(lie.so3_exp(jnp.asarray(dw))) @ R_gt[k]
        t0[k] = t_gt[k] + rng.normal(0, 0.05, 3) * k / K

    fixed = np.zeros(K, bool); fixed[0] = True
    R_out, t_out, costs = pose_graph_solve(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(fixed), jnp.ones(K, bool),
        jnp.asarray(np.array(ei, np.int32)), jnp.asarray(np.array(ej, np.int32)),
        jnp.asarray(np.stack(eR).astype(np.float32)),
        jnp.asarray(np.stack(et).astype(np.float32)),
        jnp.ones(len(ei), jnp.float32),
    )
    R_out, t_out = np.asarray(R_out), np.asarray(t_out)
    costs = np.asarray(costs)
    assert costs[-1] < 1e-3, costs  # f32 floor
    for k in range(K):
        cos = (np.trace(R_out[k] @ R_gt[k].T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.3, k  # f32 floor
        assert np.linalg.norm(t_out[k] - t_gt[k]) < 2e-2, k


def test_imu_preintegration_constant_motion(rng):
    # Body rotating at constant rate with constant body-frame acceleration.
    N = 200
    dt = 0.005
    w_true = np.array([0.1, -0.2, 0.3])
    a_body = np.array([0.5, 0.2, 9.9])
    gyro = np.tile(w_true, (N, 1)).astype(np.float32)
    acc = np.tile(a_body, (N, 1)).astype(np.float32)
    dts = np.full(N, dt, np.float32)
    pre = preintegrate(
        jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts),
        jnp.ones(N, bool), jnp.zeros(3), jnp.zeros(3),
    )
    # Ground truth by fine direct integration.
    R = np.eye(3); v = np.zeros(3); p = np.zeros(3)
    for _ in range(N):
        p = p + v * dt + 0.5 * (R @ a_body) * dt * dt
        v = v + (R @ a_body) * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w_true * dt, jnp.float32)))
    np.testing.assert_allclose(np.asarray(pre["dR"]), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pre["dv"]), v, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pre["dp"]), p, atol=1e-3)
    assert abs(float(pre["dt"]) - N * dt) < 1e-5
    cov = np.asarray(pre["cov"])
    assert np.all(np.linalg.eigvalsh(cov[:9, :9]) >= -1e-12)  # PSD


def test_imu_bias_jacobians_match_finite_difference(rng):
    N = 100
    gyro = rng.normal(0, 0.3, (N, 3)).astype(np.float32)
    acc = rng.normal(0, 1.0, (N, 3)).astype(np.float32) + np.array([0, 0, 9.8], np.float32)
    dts = np.full(N, 0.01, np.float32)
    args = (jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts), jnp.ones(N, bool))

    pre0 = preintegrate(*args, jnp.zeros(3), jnp.zeros(3))
    eps = 1e-4
    for axis in range(3):
        db = np.zeros(3, np.float32); db[axis] = eps
        pre_g = preintegrate(*args, jnp.asarray(db), jnp.zeros(3))
        # dv sensitivity to gyro bias vs Jvg column
        num = (np.asarray(pre_g["dv"]) - np.asarray(pre0["dv"])) / eps
        np.testing.assert_allclose(num, np.asarray(pre0["Jvg"])[:, axis], rtol=2e-2, atol=5e-2)
        num_p = (np.asarray(pre_g["dp"]) - np.asarray(pre0["dp"])) / eps
        np.testing.assert_allclose(num_p, np.asarray(pre0["Jpg"])[:, axis], rtol=2e-2, atol=5e-2)
        pre_a = preintegrate(*args, jnp.zeros(3), jnp.asarray(db))
        num_va = (np.asarray(pre_a["dv"]) - np.asarray(pre0["dv"])) / eps
        np.testing.assert_allclose(num_va, np.asarray(pre0["Jva"])[:, axis], rtol=2e-2, atol=5e-2)


def test_inertial_residual_zero_on_consistent_states(rng):
    # Integrate GT trajectory; residual of the true states must be ~0.
    N = 150
    dt = 0.005
    w = np.array([0.05, 0.1, -0.08])
    a_world = np.array([0.3, -0.1, 0.2])  # constant world-frame acceleration
    R = np.eye(3); v = np.zeros(3); p = np.zeros(3)
    gyros, accs = [], []
    R_i, p_i, v_i = R.copy(), p.copy(), v.copy()
    for _ in range(N):
        a_body = R.T @ (a_world - np.asarray(GRAVITY))  # measured specific force
        gyros.append(w.copy()); accs.append(a_body)
        p = p + v * dt + 0.5 * a_world * dt * dt
        v = v + a_world * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt, jnp.float32)))
    pre = preintegrate(
        jnp.asarray(np.array(gyros), jnp.float32), jnp.asarray(np.array(accs), jnp.float32),
        jnp.asarray(np.full(N, dt, np.float32)), jnp.ones(N, bool),
        jnp.zeros(3), jnp.zeros(3),
    )
    r = np.asarray(
        inertial_residual(
            pre,
            jnp.asarray(R_i, jnp.float32), jnp.asarray(p_i, jnp.float32), jnp.asarray(v_i, jnp.float32),
            jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        )
    )
    assert np.abs(r).max() < 5e-3, r


def test_inertial_gs_optimize_recovers_scale_and_gravity(rng):
    """inertial_gs_optimize (Optimizer.cc:843-950 parity) recovers the mono
    map scale and the tilted gravity direction from IMU windows with all
    poses fixed."""
    from movslam_tpu.ops.imu import inertial_gs_optimize

    s_true = 2.5
    tilt = np.asarray(lie.so3_exp(jnp.asarray([0.06, -0.04, 0.0], jnp.float32)))
    g_w = tilt @ np.asarray(GRAVITY)

    # Circular constant-speed trajectory, identity attitude: gyro = 0,
    # accelerometer measures a_world - g_w.
    r_c, omega = 2.0, 0.6
    imu_dt, per_win, K = 0.005, 100, 9

    def state(t):
        p = np.array([r_c * np.cos(omega * t), r_c * np.sin(omega * t), 0.0])
        v = r_c * omega * np.array([-np.sin(omega * t), np.cos(omega * t), 0.0])
        a = -r_c * omega**2 * np.array([np.cos(omega * t), np.sin(omega * t), 0.0])
        return p, v, a

    pres, Rs, ps, vs = [], [], [], []
    for k in range(K):
        t0 = k * per_win * imu_dt
        p, v, _ = state(t0)
        Rs.append(np.eye(3, dtype=np.float32))
        ps.append((p / s_true).astype(np.float32))  # mono map: shrunk scale
        vs.append(v.astype(np.float32))
        if k == K - 1:
            break
        accs = []
        for i in range(per_win):
            _, _, a = state(t0 + i * imu_dt)
            accs.append(a - g_w)
        pres.append(preintegrate(
            jnp.zeros((per_win, 3), jnp.float32),
            jnp.asarray(np.array(accs), jnp.float32),
            jnp.full(per_win, imu_dt, jnp.float32), jnp.ones(per_win, bool),
            jnp.zeros(3), jnp.zeros(3),
        ))

    import jax
    pres_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    out = inertial_gs_optimize(
        pres_stacked, jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ps)),
        jnp.asarray(np.stack(vs)), jnp.zeros(3), jnp.zeros(3),
        jnp.ones(K - 1, bool), iters=12,
    )
    scale = float(out["scale"])
    g_est = np.asarray(out["Rwg"]) @ np.array([0.0, 0.0, -9.81])
    cos_g = float(g_est @ g_w / (np.linalg.norm(g_est) * np.linalg.norm(g_w)))
    costs = np.asarray(out["costs"])
    assert abs(scale - s_true) / s_true < 0.02, scale
    assert cos_g > 0.9999, (g_est, g_w)
    assert costs[-1] < costs[0] * 1e-3
