"""Visual-inertial feed: IMU samples recover metric scale + gravity on a
synthetic VI sequence (the circuit the reference leaves unfed,
ImuTypes.h:139-249 / Optimizer.cc:843-950)."""
import numpy as np
import pytest

from movslam_tpu.core.inertial import ImuBuffer, visual_inertial_init
from movslam_tpu.core.map import KeyFrame, Map
from movslam_tpu.core.verbose import Verbose

Verbose.level = Verbose.QUIET


class _FakeFrame:
    def __init__(self, fid, ts, R, t):
        self.id = fid
        self.timestamp = ts
        self.R = R
        self.t = t
        self.track_ids = np.arange(4, dtype=np.int64)
        self.pts = np.zeros((4, 2))
        self.desc = None
        self.ages = None
        self.mappoints = [None] * 4
        self.image = None
        self.depth_right = None
        self.uright = None


def _make_vi_sequence(scale=0.25, n_kf=10, frame_dt=0.1, imu_dt=0.005, seed=0):
    """Camera translating with sinusoidal acceleration; the map is stored at
    `scale` times metric (mono gauge). True world gravity = (0,0,-9.81)."""
    g = np.array([0.0, 0.0, -9.81])

    def pos_m(t):  # metric position
        return np.array([0.5 * t + 0.2 * np.sin(t * 2.0), 0.3 * t, 1.0 + 0.1 * np.sin(t)])

    def acc_m(t):
        return np.array([-0.8 * np.sin(t * 2.0), 0.0, -0.1 * np.sin(t)])

    m = Map()
    buf = ImuBuffer()
    kfs = []
    fid = 0
    for k in range(n_kf):
        t = k * frame_dt * 4  # a KF every 4 frames
        R_wc = np.eye(3)  # body==camera, no rotation
        p = pos_m(t) * scale  # map-frame (shrunk) position
        R_cw = R_wc.T
        t_cw = -R_cw @ p
        fid = k * 4
        kf = KeyFrame(_FakeFrame(fid, t, R_cw, t_cw), m.id)
        m.add_keyframe(kf)
        kfs.append(kf)
        # IMU samples covering (prev fid, fid]: assign to frame ids.
        if k > 0:
            t_prev = (k - 1) * frame_dt * 4
            n = int(round((t - t_prev) / imu_dt))
            rows = np.zeros((n, 7), np.float32)
            for i in range(n):
                ti = t_prev + (i + 0.5) * imu_dt
                rows[i, 0] = imu_dt
                rows[i, 1:4] = 0.0  # no rotation
                rows[i, 4:7] = acc_m(ti) - g  # accelerometer measures a - g
            buf.add(fid, rows)  # all samples on the KF's frame id
    return m, kfs, buf, scale


def test_vi_init_recovers_metric_scale():
    m, kfs, buf, scale = _make_vi_sequence(scale=0.25)
    pre = {kf.id: kf.center().copy() for kf in kfs}
    res = visual_inertial_init(m, kfs, buf, min_windows=5)
    assert res is not None
    s = float(res["scale"])
    # The optimizer recovers 1/scale (map -> metric).
    assert abs(s * scale - 1.0) < 0.05, s
    assert m.imu_initialized
    # Map was re-expressed metric: KF separation matches metric truth.
    c0 = m.keyframes[kfs[0].id].center()
    c1 = m.keyframes[kfs[-1].id].center()
    metric_sep = np.linalg.norm((pre[kfs[-1].id] - pre[kfs[0].id]) / scale)
    assert abs(np.linalg.norm(c1 - c0) - metric_sep) < 0.05 * metric_sep
    # Velocities stamped.
    assert m.keyframes[kfs[3].id].velocity is not None


def test_vi_init_rejects_without_samples():
    m, kfs, _, _ = _make_vi_sequence()
    assert visual_inertial_init(m, kfs, ImuBuffer(), min_windows=5) is None
    assert not m.imu_initialized


def test_vi_init_gravity_direction():
    """Tilted gravity in the map frame must be rotated to -z."""
    from movslam_tpu.ops.lie import so3_exp
    import jax.numpy as jnp

    tilt = np.asarray(so3_exp(jnp.asarray([0.15, -0.1, 0.0])))
    g = tilt @ np.array([0.0, 0.0, -9.81])

    def pos_m(t):
        return np.array([0.5 * t + 0.2 * np.sin(2 * t), 0.3 * t, 0.1 * np.sin(t)])

    def acc_m(t):
        return np.array([-0.8 * np.sin(2 * t), 0.0, -0.1 * np.sin(t)])

    m = Map()
    buf = ImuBuffer()
    kfs = []
    imu_dt, frame_dt = 0.005, 0.4
    for k in range(10):
        t = k * frame_dt
        p = pos_m(t) * 0.5
        kf = KeyFrame(_FakeFrame(k * 4, t, np.eye(3), -p), m.id)
        m.add_keyframe(kf)
        kfs.append(kf)
        if k > 0:
            n = int(round(frame_dt / imu_dt))
            rows = np.zeros((n, 7), np.float32)
            for i in range(n):
                ti = (k - 1) * frame_dt + (i + 0.5) * imu_dt
                rows[i, 0] = imu_dt
                rows[i, 4:7] = acc_m(ti) - g
            buf.add(k * 4, rows)
    res = visual_inertial_init(m, kfs, buf, min_windows=5)
    assert res is not None
    # After ApplyScaledRotation the residual gravity direction is ~-z: check
    # Rwg maps -z onto the tilted gravity.
    Rwg = np.asarray(res["Rwg"])
    g_est = Rwg @ np.array([0.0, 0.0, -9.81])
    cos = g_est @ g / (np.linalg.norm(g_est) * np.linalg.norm(g))
    assert cos > 0.999, (g_est, g)
