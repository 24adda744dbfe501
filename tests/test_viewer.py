"""Viewer + debug-dump tests."""
import numpy as np



def test_track_history_polylines():
    """Viewer accumulates per-track trails and prunes dead tracks
    (FrameDrawer.cc:129-190 green trail parity)."""
    from movslam_tpu.viz.viewer import Viewer

    class _F:
        def __init__(self, tids, pts):
            self.n = len(tids)
            self.track_ids = np.asarray(tids, np.int32)
            self.pts = np.asarray(pts, np.float32)
            self.mappoints = [None] * self.n
            self.outlier = np.zeros(self.n, bool)

    class _S:
        class tracking:
            class state:
                name = "OK"

    v = Viewer(_S(), history=3)
    v.every = 10**9  # skip rendering; exercise bookkeeping only
    for k in range(5):
        v.update(_F([1, 2], [[10 + k, 10], [20, 20 + k]]), None)
    assert set(v._tracks) == {1, 2}
    assert len(v._tracks[1]) == 3  # clipped to history
    assert v._tracks[1][-1] == (14.0, 10.0)
    v.update(_F([2], [[20, 30]]), None)
    assert set(v._tracks) == {2}  # track 1 pruned when it disappears


def test_save_express_file(tmp_path):
    from movslam_tpu.ops.express import save_express_file
    from movslam_tpu.io.synthetic import SyntheticStream

    img, _, _ = SyntheticStream(n_points=30, seed=1).render(0)
    out = save_express_file(str(tmp_path / "ex.png"), img, 25)
    assert out.shape == img.shape
    assert (out == 0).any() and (out == 255).any()


def test_draw_map_covis_frusta():
    """Top-down MapDrawer renders covisibility edges, spanning-tree edges,
    keyframe frusta and the current camera (MapDrawer.cc DrawKeyFrames /
    DrawGraph parity) without touching a live device."""
    from movslam_tpu.viz.viewer import Viewer

    class _KF:
        def __init__(self, kid, c, parent=None, covis=()):
            self.id = kid
            self._c = np.asarray(c, float)
            self.R = np.eye(3)
            self.t = -self._c
            self.covis = dict(covis)
            self.parent = parent
            self.bad = False

        def center(self):
            return self._c

    class _MP:
        def __init__(self, p):
            self.pos = np.asarray(p, float)
            self.bad = False

    k0 = _KF(0, [0, 0, 0])
    k1 = _KF(1, [1, 0, 0.2], parent=k0, covis={0: 40})
    k0.covis = {1: 40}

    class _Cur:
        pose_set = True
        R = np.eye(3)
        t = np.array([-0.5, 0.0, -0.1])

    class _S:
        class atlas:
            class current:
                mappoints = {0: _MP([0.2, 0, 1.0]), 1: _MP([0.8, 0, 1.2])}
                keyframes = {0: k0, 1: k1}

        class tracking:
            current = _Cur()

    img = Viewer(_S()).draw_map(size=128)
    assert img.shape == (128, 128, 3)
    # Some non-white pixels must have been drawn (points/edges/frusta).
    assert (img < 250).any()
    # Red current-camera dot present (BGR channel order: (0, 0, 255)).
    red = (img[:, :, 2] == 255) & (img[:, :, 0] == 0) & (img[:, :, 1] == 0)
    assert red.any()
