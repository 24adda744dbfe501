"""System-level features: checkpoint round-trip, loss recovery, timings,
viewer rendering, threaded mapper."""
import os
import tempfile

import numpy as np
import pytest

from movslam_tpu.config.settings import Settings, MONOCULAR
from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.system import System
from movslam_tpu.core.tracking import State
from movslam_tpu.io.mvimage import MotionVectorImage
from movslam_tpu.io.synthetic import SyntheticStream


def _settings():
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = MONOCULAR
    return s


def _run(system, stream, n, start=0):
    for k in range(start, start + n):
        smv = stream.frame(k)
        system.track_monocular(smv.timestamp, smv)


def test_atlas_checkpoint_roundtrip():
    stream = SyntheticStream(n_points=300, seed=21)
    system = System(_settings(), MONOCULAR)
    _run(system, stream, 15)
    system.shutdown()
    m = system.atlas.current
    n_kfs, n_mps = m.n_keyframes(), m.n_mappoints()
    assert n_kfs > 3 and n_mps > 100

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "session.atlas")
        system.save_atlas(path)

        from movslam_tpu.core.checkpoint import load_atlas

        atlas2 = load_atlas(path)
        m2 = atlas2.current
        assert m2.n_keyframes() == n_kfs
        assert m2.n_mappoints() == n_mps
        # Graph links restored: observations point at existing KFs/slots.
        for mp in list(m2.mappoints.values())[:50]:
            for kf_id, slot in mp.obs.items():
                kf = m2.keyframes.get(kf_id)
                assert kf is not None
                assert kf.mp_ids[slot] == mp.id
        # Poses identical.
        for kf_id, kf in m.keyframes.items():
            np.testing.assert_allclose(m2.keyframes[kf_id].R, kf.R)


def test_tracking_loss_recovery_creates_map_or_recovers():
    """Feed garbage frames mid-stream: tracking must not crash and must
    either recover on the old map or start a new Atlas map
    (Tracking.cc:362-381 semantics)."""
    stream = SyntheticStream(n_points=300, seed=22)
    system = System(_settings(), MONOCULAR)
    _run(system, stream, 16)  # enough KFs (>10) for RECENTLY_LOST path
    assert system.tracking.state == State.OK
    n_maps_before = len(system.atlas.maps)

    # 8 featureless frames (MV-free, flat) -> certain loss.
    rngloc = np.random.default_rng(0)
    for k in range(16, 24):
        smv = MotionVectorImage.empty(640, 480)
        smv.timestamp = k / 30.0
        smv.im_gray = rngloc.integers(100, 110, (480, 640)).astype(np.uint8)
        system.track_monocular(smv.timestamp, smv)

    assert system.tracking.state in (State.RECENTLY_LOST, State.LOST,
                                     State.NO_IMAGES_YET, State.NOT_INITIALIZED)
    # lost counting depends on whether the map was reset (small maps)
    # or a new Atlas map was spawned; both are valid recoveries.

    # Resume the real stream: system keeps running (new map or recovery).
    _run(system, stream, 15, start=24)
    st = system.tracking.state
    assert st in (State.OK, State.NOT_INITIALIZED, State.RECENTLY_LOST)
    assert len(system.atlas.maps) >= n_maps_before


def test_timings_populated():
    stream = SyntheticStream(n_points=300, seed=23)
    system = System(_settings(), MONOCULAR)
    _run(system, stream, 8)
    t = system.get_timings()
    assert t["frame_total"]["n"] == 8
    assert t["track_local_map"]["n"] >= 3
    assert t["local_ba"]["n"] >= 1
    assert t["frame_total"]["mean"] > 0


def test_viewer_renders():
    stream = SyntheticStream(n_points=300, seed=24)
    system = System(_settings(), MONOCULAR, use_viewer=True)
    _run(system, stream, 6)
    img = system.viewer.last_frame_render
    assert img is not None and img.shape == (480, 640, 3)
    top = system.viewer.draw_map()
    assert top.shape[2] == 3


def test_async_mapping_thread():
    """Threaded LocalMapping (reference 3-thread topology): same pipeline,
    mapper on a background thread with the map lock."""
    stream = SyntheticStream(n_points=300, seed=25)
    system = System(_settings(), MONOCULAR, async_mapping=True)
    _run(system, stream, 15)
    system.shutdown()
    assert system.tracking.state == State.OK
    m = system.atlas.current
    assert m.n_keyframes() >= 4
    assert m.n_mappoints() > 100


def test_global_bundle_adjustment():
    """System.global_bundle_adjustment (System.cc:162-169): full-map BA
    runs, keeps the map finite, and does not increase total reprojection
    error."""
    stream = SyntheticStream(n_points=300, seed=21)
    system = System(_settings(), MONOCULAR)
    _run(system, stream, 20)
    m = system.atlas.current
    n_kf = len([k for k in m.keyframes.values() if not k.bad])
    assert n_kf >= 3

    def total_reproj(m):
        err = 0.0
        n = 0
        for kf in m.keyframes.values():
            if kf.bad:
                continue
            slots = np.flatnonzero(kf.mp_ids >= 0)
            for s in slots:
                mp = m.mappoints.get(int(kf.mp_ids[s]))
                if mp is None or mp.bad:
                    continue
                pc = kf.R @ mp.pos + kf.t
                if pc[2] <= 1e-6:
                    continue
                cam = system.mapper.camera
                u = cam.fx * pc[0] / pc[2] + cam.cx
                v = cam.fy * pc[1] / pc[2] + cam.cy
                uv = kf.pts[s]
                err += float((u - uv[0]) ** 2 + (v - uv[1]) ** 2)
                n += 1
        return err / max(n, 1)

    before = total_reproj(m)
    system.global_bundle_adjustment(iters=10)
    after = total_reproj(m)
    for kf in m.keyframes.values():
        assert np.all(np.isfinite(kf.t))
    for mp in m.mappoints.values():
        if not mp.bad:
            assert np.all(np.isfinite(mp.pos))
    # GBA prunes chi2>5 obs and re-optimizes: mean residual must not blow up.
    assert after <= before * 1.5 + 1e-6
    system.shutdown()


@pytest.mark.slow
def test_keyframe_culling_bounds_map_growth():
    """LocalMapping::KeyFrameCulling (declared-but-dead in the reference,
    LocalMapping.h:131; ORB-SLAM3 policy): redundant local keyframes are
    removed on long runs, the trajectory savers still emit every frame
    (culled references resolve through the Tcp parent chain), and accuracy
    is unharmed."""
    from movslam_tpu.io.synthetic import SyntheticStream

    stream = SyntheticStream(n_points=400, seed=42)
    items = [(f.timestamp, f) for f in [stream.frame(k) for k in range(160)]]
    sys_w = System(_settings(), MONOCULAR)
    k = 0
    while k < len(items):
        sys_w.track_monocular_batch(items[k : k + 8])
        k += 8
    sys_w.shutdown()
    assert sys_w.get_total_lost() == 0
    m = sys_w.atlas.current
    n_culled = sys_w.mapper.n_culled_kfs
    assert n_culled > 0, "no keyframes culled on a 160-frame run"
    assert len(m.culled_keyframes) == n_culled
    # Savers: every post-initialization frame still resolves to a pose
    # (monocular init consumes the first 2-3 frames).
    traj = sys_w.frame_trajectory()
    assert len(traj) >= len(items) - 4
    # Culled KFs resolve through live ancestors: all poses finite.
    for ts, R, t, lost in traj:
        assert np.isfinite(R).all() and np.isfinite(t).all()
    # Scale-aligned ATE stays within the golden band despite culling.
    from evaluation.evaluator import umeyama_alignment

    est, gt = [], []
    for ts, R, t, lost in traj:
        est.append(-(R.T @ t))
        R_gt, t_gt = stream.gt_pose(round(ts * 30.0))
        gt.append(-(R_gt.T @ t_gt))
    est, gt = np.array(est), np.array(gt)
    s, Ra, ta = umeyama_alignment(gt, est, with_scale=True)
    resid = gt - (s * est @ Ra.T + ta)
    ate = float(np.sqrt(np.mean(np.sum(resid**2, axis=1))))
    span = float(np.linalg.norm(np.ptp(gt, axis=0)))
    assert ate / span < 0.05, (ate, span, n_culled)


def test_localization_only_mode():
    """System::Activate/DeactivateLocalizationMode
    (/root/reference/src/System.cc:171-234, System.h:118-121): with the mode
    active, tracking runs against the FROZEN map — no keyframes, no new map
    points, no atlas mutation — and poses keep coming; deactivating resumes
    mapping."""
    stream = SyntheticStream(n_points=400, seed=31)
    system = System(_settings(), MONOCULAR)
    _run(system, stream, 40)
    assert system.tracking.state == State.OK
    system.activate_localization_mode()
    m = system.atlas.current
    n_kfs, n_mps = m.n_keyframes(), m.n_mappoints()
    n_maps = len(system.atlas.maps)
    change = m.change_index
    kf_poses = {kid: (kf.R.copy(), kf.t.copy())
                for kid, kf in m.keyframes.items()}

    poses = []
    for k in range(40, 80):
        smv = stream.frame(k)
        poses.append(system.track_monocular(smv.timestamp, smv))

    assert m.n_keyframes() == n_kfs, "keyframe created in localization mode"
    assert m.n_mappoints() == n_mps, "map point created in localization mode"
    assert len(system.atlas.maps) == n_maps
    assert m.change_index == change, "map mutated in localization mode"
    for kid, (R0, t0) in kf_poses.items():
        kf = m.keyframes[kid]
        np.testing.assert_array_equal(kf.R, R0)
        np.testing.assert_array_equal(kf.t, t0)
    # Still localizing: most frames produce a pose on the frozen map.
    ok = [p for p in poses if p is not None]
    assert len(ok) >= 30, f"only {len(ok)}/40 frames localized"

    # Deactivate: mapping resumes (keyframes accumulate again).
    system.deactivate_localization_mode()
    _run(system, stream, 30, start=80)
    system.shutdown()
    assert system.atlas.current.n_keyframes() > n_kfs \
        or len(system.atlas.maps) > n_maps


def test_localization_mode_windowed_batch():
    """The windowed pipelined drive honors localization mode: whole windows
    dispatch with no predicted keyframes and the map stays frozen."""
    stream = SyntheticStream(n_points=400, seed=32)
    system = System(_settings(), MONOCULAR)
    items = [(f.timestamp, f) for f in [stream.frame(k) for k in range(120)]]
    k = 0
    while k < 64:
        system.track_monocular_batch(items[k : k + 8], flush=False)
        k += 8
    system.track_monocular_batch([], flush=True)
    system.activate_localization_mode()
    m = system.atlas.current
    n_kfs, n_mps, change = m.n_keyframes(), m.n_mappoints(), m.change_index

    got = []
    while k < 120:
        got.extend(system.track_monocular_batch(items[k : k + 8], flush=False))
        k += 8
    got.extend(system.track_monocular_batch([], flush=True))
    system.shutdown()

    assert m.n_keyframes() == n_kfs
    assert m.n_mappoints() == n_mps
    assert m.change_index == change
    ok = [p for p in got if p is not None]
    assert len(ok) >= 48, f"only {len(ok)}/{len(got)} frames localized"
