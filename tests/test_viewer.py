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
