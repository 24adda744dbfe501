"""Smoke-tier end-to-end slice: a short mono run through the legacy
(multi-dispatch) front end — small programs, fast first compile — covering
decoder -> extractor -> matching -> PnP -> keyframes -> mapper -> savers.

The heavyweight fused/windowed paths get their own smoke coverage via the
marked tests in test_window.py; everything else end-to-end lives in the
slow tier (test_pipeline.py, test_system_features.py)."""
import numpy as np
import pytest

from movslam_tpu.config.settings import MONOCULAR, Settings
from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.system import System
from movslam_tpu.core.tracking import State
from movslam_tpu.core.verbose import Verbose
from movslam_tpu.io.synthetic import SyntheticStream

pytestmark = pytest.mark.smoke

Verbose.level = Verbose.QUIET


def test_short_mono_run_tracks_and_saves(tmp_path):
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = MONOCULAR
    system = System(s, MONOCULAR)
    system.fused_frontend = False  # small programs: smoke must compile fast
    stream = SyntheticStream(n_points=400, seed=3)
    poses = []
    for k in range(25):
        smv = stream.frame(k)
        poses.append(system.track_monocular(smv.timestamp, smv))
    assert system.tracking.state == State.OK
    assert system.get_total_lost() == 0
    assert sum(p is not None for p in poses) >= 20
    m = system.atlas.current
    assert m.n_keyframes() >= 2
    assert m.n_mappoints() > 50
    system.shutdown()

    kitti = tmp_path / "kitti.txt"
    euroc = tmp_path / "euroc.txt"
    system.save_keyframe_trajectory_kitti(str(kitti))
    system.save_trajectory_euroc(str(euroc))
    rows = np.loadtxt(kitti)
    assert rows.ndim == 2 and rows.shape[1] == 13
    rows_e = np.loadtxt(euroc)
    assert rows_e.ndim == 2 and rows_e.shape[1] == 8
