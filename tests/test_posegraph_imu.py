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
