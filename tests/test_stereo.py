"""Stereo pipeline: LK stereo depth + stereo initialization + tracking."""
import numpy as np
import pytest

from movslam_tpu.config.settings import Settings, STEREO
from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.system import System
from movslam_tpu.core.tracking import State
from movslam_tpu.io.synthetic_stereo import SyntheticStereoStream


def _settings(baseline=0.25):
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = STEREO
    s.b = baseline
    s.bf = baseline * 320.0
    s.th_depth = 50.0
    # Stereo operating point (Examples/Stereo/TartanAir.yaml): tighter PnP.
    s.reprojection_error = 2.0
    s.reprojection_error_lost = 5.0
    return s


def test_stereo_depth_on_synthetic_pair():
    from movslam_tpu.core.frame import Frame
    from movslam_tpu.core.stereo import compute_stereo_depth

    stream = SyntheticStereoStream(n_points=200, seed=4, baseline=0.25)
    left, right = stream.pair(0)

    # Features at known foreground projections.
    uv, vis = stream.left._project(0)
    sel = np.flatnonzero(vis)[:60]
    f = Frame()
    f.pts = uv[sel].astype(np.float64)
    f.track_ids = np.arange(len(sel), dtype=np.int64)
    f.mappoints = [None] * len(sel)
    f.outlier = np.zeros(len(sel), bool)

    compute_stereo_depth(f, left.im_gray, right.im_gray, _settings())
    depth = f.depth_right
    ok = depth > 0
    assert ok.mean() > 0.6, ok.mean()

    # True depth = z of the 3D point in the left camera.
    R, t = stream.gt_pose(0)
    pc = stream.left.points[sel] @ R.T + t
    z_true = pc[:, 2]
    rel = np.abs(depth[ok] - z_true[ok]) / z_true[ok]
    assert np.median(rel) < 0.08, np.median(rel)


@pytest.mark.slow
def test_stereo_pipeline_metric_scale():
    stream = SyntheticStereoStream(n_points=500, seed=6, baseline=0.25)
    system = System(_settings(), STEREO)

    est = {}
    for k in range(25):
        left, right = stream.pair(k)
        pose = system.track_stereo(left.timestamp, left, right)
        if pose is not None:
            R, t = pose
            est[k] = -(R.T @ t)

    assert system.tracking.state == State.OK
    assert len(est) >= 20
    m = system.atlas.current
    assert m.n_mappoints() > 100

    # The estimate lives in the init-frame camera coordinates (stereo init
    # sets identity at the first keyframe); rigid-align with the KNOWN init
    # pose — no scale freedom, so metric scale is genuinely tested.
    k0 = min(est)
    R0, t0 = stream.gt_pose(k0)
    gt = np.array([-(stream.gt_pose(k)[0].T @ stream.gt_pose(k)[1]) for k in est])
    es = np.array(list(est.values()))
    es_world = (R0.T @ (es - t0[None]).T).T
    err = np.linalg.norm(gt - es_world, axis=1)
    # Known round-1 limitation: an early-map pose wobble (~0.2 m)
    # bakes into the gauge before BA stabilizes (see TODO.md); late-
    # trajectory relative accuracy is ~3-4 cm.
    assert np.median(err) < 0.35, np.median(err)
    # Path length within 60% (per-frame PnP jitter inflates it; a rigid
    # transform cannot change it, so gross scale errors would still fail).
    lg = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    le = np.linalg.norm(np.diff(es, axis=0), axis=1).sum()
    assert 0.5 < le / lg < 2.2, (le, lg)  # raw per-frame PnP jitter inflates this
    # Keyframe (post-BA) centers are metric-accurate.
    kf_err = []
    for kf in m.keyframes.values():
        Rg, tg = stream.gt_pose(kf.frame_id)
        ce_world = R0.T @ (kf.center() - t0)
        kf_err.append(np.linalg.norm(-(Rg.T @ tg) - ce_world))
    assert np.median(kf_err) < 0.35, np.median(kf_err)
