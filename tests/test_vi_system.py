"""End-to-end visual-inertial monocular run: feeding IMU samples through
System.track_monocular(..., imu=...) recovers METRIC scale (ATE against
ground truth with scale fixed to 1) — BASELINE config 5's capability."""
import numpy as np
import pytest

from movslam_tpu.config.settings import IMU_MONOCULAR, Settings
from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.system import System
from movslam_tpu.core.verbose import Verbose
from movslam_tpu.io.synthetic import SyntheticStream

Verbose.level = Verbose.QUIET

G_W = np.array([0.0, 0.0, -9.81])


def _imu_window(stream, k, n_sub=8):
    """Exact-ish IMU samples over (frame k-1, frame k] by central differences
    of the analytic ground-truth pose (smooth orbit path)."""
    fps = stream.fps
    dt = 1.0 / (fps * n_sub)
    rows = np.zeros((n_sub, 7), np.float32)

    def center(t_frames):
        R, t = stream.gt_pose(t_frames)
        return -(R.T @ t)

    def R_wc(t_frames):
        R, _ = stream.gt_pose(t_frames)
        return R.T

    for i in range(n_sub):
        tf = (k - 1) + (i + 0.5) / n_sub  # frame-index time of the sample
        h = 0.05  # frame-index step for finite differences
        # world acceleration (per second^2): d2C/dtf2 * fps^2
        a_w = (center(tf + h) - 2 * center(tf) + center(tf - h)) / (h * h) * fps * fps
        Rw = R_wc(tf)
        # gyro: omega_body = vee(R_wc^T dR_wc/dt)
        dR = (R_wc(tf + h) - R_wc(tf - h)) / (2 * h) * fps
        Om = Rw.T @ dR
        w_body = np.array([Om[2, 1], Om[0, 2], Om[1, 0]])
        rows[i, 0] = dt
        rows[i, 1:4] = w_body
        rows[i, 4:7] = Rw.T @ (a_w - G_W)
    return rows


@pytest.mark.slow
def test_vi_monocular_recovers_metric_scale():
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = IMU_MONOCULAR
    stream = SyntheticStream(n_points=400, seed=11)
    n = 60
    sys_vi = System(s, IMU_MONOCULAR)
    sys_vi.mapper.vi_min_kfs = 8
    for k in range(n):
        smv = stream.frame(k)
        imu = _imu_window(stream, k) if k > 0 else None
        sys_vi.track_monocular(smv.timestamp, smv, imu=imu)
    sys_vi.shutdown()

    m = sys_vi.atlas.current
    assert m.imu_initialized, "VI init never ran"
    # Metric check: keyframe centers vs ground truth WITHOUT scale alignment.
    errs = []
    for kf in m.keyframes.values():
        R_gt, t_gt = stream.gt_pose(kf.frame_id)
        C_gt = -(R_gt.T @ t_gt)
        errs.append(np.linalg.norm(kf.center() - C_gt))
    errs = np.array(errs)
    span = 0.0
    cs = [(-(stream.gt_pose(k)[0].T @ stream.gt_pose(k)[1])) for k in range(n)]
    span = float(np.linalg.norm(np.ptp(np.array(cs), axis=0)))
    # Median metric error under 15% of the trajectory span (mono would be at
    # an arbitrary scale — typically off by the ~10x median scene depth).
    assert np.median(errs) < 0.15 * max(span, 0.5), (np.median(errs), span)

    # The live VI-BA (ops/vi_ba via LocalMapping._local_ba_vi) must have
    # stamped velocity/bias states onto post-init keyframes in the temporal
    # chain — not just the VI-init snapshot.
    last_kf = max(m.keyframes.values(), key=lambda kf: kf.id)
    assert last_kf.velocity is not None
    assert last_kf.bias_g is not None


@pytest.mark.smoke
def test_euroc_vi_config_parses():
    """configs/EuRoC_VI.yaml (BASELINE config 5 entry point): IMU.* keys
    land in Settings (the reference declares Settings::readIMU but never
    defines it, Settings.h:159)."""
    s = Settings.from_yaml("configs/EuRoC_VI.yaml", IMU_MONOCULAR)
    assert s.imu_noise_gyro == pytest.approx(1.7e-4)
    assert s.imu_noise_acc == pytest.approx(2.0e-3)
    assert s.imu_gyro_walk == pytest.approx(1.9e-5)
    assert s.imu_acc_walk == pytest.approx(3.0e-3)
    assert s.imu_frequency == pytest.approx(200.0)
    assert s.camera1.fx == pytest.approx(458.654)


@pytest.mark.slow
def test_vi_windowed_batch_drive_recovers_metric_scale():
    """BASELINE config 5 through the PRODUCTION drive: (ts, smv, imu)
    triples through track_monocular_batch (windowed, pipelined) — the same
    path the mono app's --imu mode uses (movslam_tpu/cli.py) — recover
    metric scale."""
    from movslam_tpu.io.synthetic_vi import SyntheticVIStream

    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = IMU_MONOCULAR
    stream = SyntheticVIStream(n_points=400, seed=11)
    n = 96
    sys_vi = System(s, IMU_MONOCULAR)
    sys_vi.mapper.vi_min_kfs = 8
    items = list(stream.items(n))
    W = sys_vi.window
    k = 0
    while k < n:
        sys_vi.track_monocular_batch(items[k : k + W], flush=False)
        k += W
    sys_vi.track_monocular_batch([], flush=True)
    sys_vi.shutdown()

    m = sys_vi.atlas.current
    assert m.imu_initialized, "VI init never ran in the windowed drive"
    errs = []
    for kf in m.keyframes.values():
        R_gt, t_gt = stream.gt_pose(kf.frame_id)
        C_gt = -(R_gt.T @ t_gt)
        errs.append(np.linalg.norm(kf.center() - C_gt))
    errs = np.array(errs)
    cs = [(-(stream.gt_pose(k)[0].T @ stream.gt_pose(k)[1])) for k in range(n)]
    span = float(np.linalg.norm(np.ptp(np.array(cs), axis=0)))
    # Metric (scale=1) median error: mono without IMU would sit at an
    # arbitrary scale, typically ~10x off on this scene.
    assert np.median(errs) < 0.15 * max(span, 0.5), (np.median(errs), span)
