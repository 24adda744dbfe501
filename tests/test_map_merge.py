"""Atlas multi-map merge: Sim3 weld + pose-graph relaxation."""
import numpy as np
import pytest

from movslam_tpu.config.settings import Settings, MONOCULAR
from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.system import System
from movslam_tpu.core.map_merge import merge_maps, try_merge, umeyama_sim3
from movslam_tpu.io.synthetic import SyntheticStream
from movslam_tpu.ops import lie
import jax.numpy as jnp


def _settings():
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = MONOCULAR
    return s


def _build_map_pair():
    """Two maps of the same scene: run one stream, snapshot the map, then
    apply a known Sim3 to a deep copy to play the 'new map' role."""
    stream = SyntheticStream(n_points=300, seed=31)
    system = System(_settings(), MONOCULAR)
    for k in range(14):
        smv = stream.frame(k)
        system.track_monocular(smv.timestamp, smv)
    system.shutdown()
    atlas = system.atlas
    m_old = atlas.current

    # Save + reload to get an independent copy with identical ids.
    import tempfile, os
    from movslam_tpu.core.checkpoint import save_atlas, load_atlas

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.atlas")
        save_atlas(atlas, p)
        atlas2 = load_atlas(p)
    m_new = atlas2.current

    # Known Sim3 offset applied to the copy.
    s = 1.7
    R = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.3, 0.1], jnp.float32))).astype(np.float64)
    t = np.array([2.0, -1.0, 0.5])
    for kf in m_new.keyframes.values():
        # x_new = R_inv (x_old - t)/s  => poses transform accordingly
        R_c2 = kf.R @ R
        t_c2 = (kf.t + kf.R @ R @ (R.T @ t)) / s  # t_c2 = (t_c1 + R_c1 t)/s
        t_c2 = (kf.t + (kf.R @ R) @ (R.T @ t)) / s
        kf.set_pose(R_c2, t_c2)
    for mp in m_new.mappoints.values():
        mp.pos = R.T @ (mp.pos - t) / s

    # Re-key the copy's ids so they don't collide with m_old's.
    offset_kf = max(m_old.keyframes) + 1000
    offset_mp = max(m_old.mappoints) + 100000
    m_new.keyframes = {k + offset_kf: v for k, v in m_new.keyframes.items()}
    for k, kf in m_new.keyframes.items():
        kf.id = k
        kf.covis = {c + offset_kf: w for c, w in kf.covis.items()}
        kf.mp_ids = np.where(kf.mp_ids >= 0, kf.mp_ids + offset_mp, -1)
    m_new.mappoints = {k + offset_mp: v for k, v in m_new.mappoints.items()}
    for k, mp in m_new.mappoints.items():
        mp.id = k
        mp.obs = {kf_id + offset_kf: slot for kf_id, slot in mp.obs.items()}
        mp.first_kf_id += offset_kf
    m_new.init_kf_id += offset_kf

    return atlas, m_old, m_new, (s, R, t)


def test_umeyama_sim3_exact(rng):
    x = rng.normal(0, 2, (50, 3))
    s, R, t = 1.3, np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1], jnp.float32))), np.array([1, 2, 3.0])
    y = x @ (s * np.asarray(R, np.float64)).T + t
    s2, R2, t2 = umeyama_sim3(x, y)
    assert abs(s2 - s) < 1e-6
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)


def test_merge_maps_welds_and_aligns():
    atlas, m_old, m_new, (s, R, t) = _build_map_pair()
    atlas.maps.append(m_new)
    atlas.current = m_new
    n_kf_old = m_old.n_keyframes()
    n_kf_new = m_new.n_keyframes()

    old_positions = {
        mp.track_id: mp.pos.copy() for mp in m_old.mappoints.values() if not mp.bad
    }

    assert try_merge(atlas)
    assert atlas.current is m_old
    assert len(atlas.maps) == 1
    # All keyframes live in the merged map.
    assert m_old.n_keyframes() == n_kf_old + n_kf_new
    # Shared landmarks were deduplicated: one point per track id.
    tids = [mp.track_id for mp in m_old.mappoints.values() if not mp.bad]
    assert len(tids) == len(set(tids))
    # Welded positions agree with the old map's frame.
    errs = []
    for mp in m_old.mappoints.values():
        if not mp.bad and mp.track_id in old_positions:
            errs.append(np.linalg.norm(mp.pos - old_positions[mp.track_id]))
    assert np.median(errs) < 0.05, np.median(errs)


def test_merge_rejects_unrelated_maps():
    atlas, m_old, m_new, _ = _build_map_pair()
    # Destroy the correspondences: give the new map disjoint track ids.
    for mp in m_new.mappoints.values():
        mp.track_id += 10_000_000
    atlas.maps.append(m_new)
    atlas.current = m_new
    assert not try_merge(atlas)
    assert len(atlas.maps) == 2
