"""True full-map global BA: every good keyframe optimized, including maps
larger than one solver window (Optimizer.cc:61-395 parity; round-1 silently
truncated to the last 48 KFs)."""
import numpy as np
import pytest

from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.local_mapping import global_bundle_adjustment
from movslam_tpu.core.map import KeyFrame, Map, MapPoint
from movslam_tpu.core.verbose import Verbose
from tests.test_inertial import _FakeFrame

Verbose.level = Verbose.QUIET


def _build_map(n_kf=120, n_mp=600, noise=5e-3, seed=0):
    """A circular-ish trajectory observing a point cloud; keyframe poses and
    points are perturbed so BA has something to correct."""
    rng = np.random.default_rng(seed)
    cam = Pinhole(300.0, 300.0, 160.0, 120.0, 320, 240)
    m = Map()

    X_true = rng.uniform(-4, 4, (n_mp, 3))
    X_true[:, 2] += 12.0

    kfs = []
    obs_uv = {}
    for k in range(n_kf):
        t = k / n_kf
        c = np.array([3 * np.sin(2 * np.pi * t), 3 * np.cos(2 * np.pi * t), -1.0 + 2 * t])
        R = np.eye(3)
        t_cw = -R @ c
        pc = X_true @ R.T + t_cw
        u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
        v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
        vis = (pc[:, 2] > 1) & (u >= 0) & (u < 320) & (v >= 0) & (v < 240)
        fr = _FakeFrame(k, k / 10.0, R, t_cw)
        sel = np.flatnonzero(vis)[:40]
        fr.track_ids = sel.astype(np.int64)
        fr.pts = np.stack([u[sel], v[sel]], axis=1)
        fr.mappoints = [None] * len(sel)
        kf = KeyFrame(fr, m.id)
        m.add_keyframe(kf)
        kfs.append(kf)
        obs_uv[kf.id] = (sel, fr.pts)

    mps = {}
    for j in range(n_mp):
        mp = MapPoint(X_true[j] + rng.normal(0, noise, 3), kfs[0].id, j, m.id)
        mps[j] = mp
        m.add_mappoint(mp)
    for kf in kfs:
        sel, _ = obs_uv[kf.id]
        for slot, j in enumerate(sel):
            mp = mps[int(j)]
            mp.add_observation(kf, slot)
            kf.mp_ids[slot] = mp.id

    # Perturb all poses except the first (the gauge anchor).
    for kf in kfs[1:]:
        kf.set_pose(kf.R, kf.t + rng.normal(0, noise * 4, 3))
    return m, cam, kfs, X_true


@pytest.mark.slow
def test_global_ba_touches_every_keyframe():
    m, cam, kfs, X_true = _build_map(n_kf=120)
    before = {kf.id: kf.t.copy() for kf in kfs}
    global_bundle_adjustment(m, cam, iters=10)
    moved = sum(
        1 for kf in kfs[1:] if np.linalg.norm(m.keyframes[kf.id].t - before[kf.id]) > 1e-9
    )
    # Every non-anchor keyframe was optimized (no silent truncation).
    assert moved >= len(kfs) - 2, moved
    for kf in kfs:
        assert np.isfinite(m.keyframes[kf.id].t).all()


@pytest.mark.slow
def test_global_ba_windowed_beyond_bucket(monkeypatch):
    """Maps beyond the largest KF bucket run in overlapping windows — every
    keyframe still gets optimized."""
    import movslam_tpu.core.local_mapping as lm

    monkeypatch.setattr(lm, "GBA_KF_BUCKETS", (16, 32, 48))
    m, cam, kfs, _ = _build_map(n_kf=120)
    before = {kf.id: kf.t.copy() for kf in kfs}
    lm.global_bundle_adjustment(m, cam, iters=5)
    moved = sum(
        1 for kf in kfs[1:] if np.linalg.norm(m.keyframes[kf.id].t - before[kf.id]) > 1e-9
    )
    assert moved >= len(kfs) - 2, moved
