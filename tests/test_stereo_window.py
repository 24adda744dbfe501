"""Windowed stereo front end: on-device depth (frame body stage 1c), stereo
rows in the per-frame PnP, and metric accuracy across seeds.

Error convention: a SLAM system's world frame is its init camera frame —
StereoInitialization sets the init frame's pose to identity (reference
Tracking.cc:524), and init fires at the first frame with >500 features,
which is NOT always frame 0 (the MV cold-start yields <500 keypoints on
some seeds until frame ~3). The estimate is therefore composed with the
ground-truth pose of the init frame (a KNOWN rigid transform, not a fitted
alignment — scale stays untouched, the metric claim stands) before
differencing against ground truth. Rounds 1-3 compared raw world frames and
mis-read that init offset (|C_gt(3)| = 0.358 m) as an "early-map gauge
excursion"; the actual estimation error was always in the 0.1-0.2 m band.
"""
import numpy as np
import pytest

from movslam_tpu.config.settings import STEREO, Settings
from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.system import System
from movslam_tpu.core.verbose import Verbose
from movslam_tpu.io.synthetic_stereo import SyntheticStereoStream

Verbose.level = Verbose.QUIET


def _settings():
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = STEREO
    s.b = 0.25
    s.bf = 0.25 * 320.0
    s.th_depth = 50.0
    return s


def _run(seed, n=40, windowed=True):
    stream = SyntheticStereoStream(seed=seed)
    items = [
        (l.timestamp, l, r) for l, r in stream.pairs(n)
    ]
    sys_s = System(_settings(), STEREO)
    if windowed:
        k = 0
        while k < len(items):
            sys_s.track_stereo_batch(items[k : k + 8])
            k += 8
    else:
        for ts, l, r in items:
            sys_s.track_stereo(ts, l, r)
    sys_s.shutdown()
    # Per-frame absolute trajectory error vs ground truth (metric: no scale
    # or fitted alignment). The estimate's world frame is the init camera
    # frame (identity at init, Tracking.cc:524): compose with the GT pose of
    # the init frame to express both trajectories in the same world.
    m = sys_s.atlas.current
    k0 = min(kf.frame_id for kf in m.keyframes.values())
    R0, t0 = stream.gt_pose(k0)
    errs = []
    for k, (R_rel, t_rel) in enumerate(sys_s.tracking.rel_poses):
        if k + 1 < k0:
            continue  # no estimate exists before initialization
        ref = sys_s.tracking.rel_refs[k]
        R = R_rel @ ref.R
        t = R_rel @ ref.t + t_rel
        Rg = R @ R0
        tg = R @ t0 + t
        C = -(Rg.T @ tg)
        R_gt, t_gt = stream.gt_pose(k + 1)
        C_gt = -(R_gt.T @ t_gt)
        errs.append(np.linalg.norm(C - C_gt))
    return sys_s, np.array(errs)


@pytest.mark.slow
def test_stereo_windowed_tracks_metric():
    sys_s, errs = _run(seed=5)
    assert sys_s.get_total_lost() == 0
    # Stereo is metric: no scale or fitted alignment allowed.
    assert np.median(errs) < 0.20, np.median(errs)
    assert errs.max() < 0.8, errs.max()


@pytest.mark.slow
def test_stereo_gauge_stable_across_seeds():
    """Metric accuracy must hold on every seed, including those whose init
    fires late (7/23 initialize at frame 3). With the init-frame composition
    the measured band is 0.10-0.16 m median; the bounds hold that band with
    headroom but stay well under the 0.38-0.55 m band the round-2/3
    recalibrated test tolerated."""
    meds, maxes = [], []
    for seed in (1, 7, 23):
        _, errs = _run(seed=seed, n=30)
        meds.append(np.median(errs))
        maxes.append(errs.max())
    assert min(meds) < 0.15, meds
    assert max(meds) < 0.20, meds
    assert max(maxes) < 0.50, maxes
