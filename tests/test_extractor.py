"""Extractor pipeline on the synthetic MV stream: persistent track ids."""
import pytest
import numpy as np
import jax.numpy as jnp

from movslam_tpu.core.extractor import MOVExtractor
from movslam_tpu.io.synthetic import SyntheticStream
from movslam_tpu.io.mvimage import FrameType
from movslam_tpu.ops.mvselect import candidate_mvs

pytestmark = pytest.mark.smoke


def test_candidate_mvs_matches_bruteforce(rng):
    N, M = 64, 200
    pts = rng.uniform(0, 100, (N, 2)).astype(np.float32)
    x0 = rng.uniform(0, 90, M).astype(np.float32)
    y0 = rng.uniform(0, 90, M).astype(np.float32)
    rect = np.stack([x0, y0, x0 + 15, y0 + 15], -1).astype(np.float32)
    valid = rng.uniform(size=M) > 0.2

    cand = np.asarray(
        candidate_mvs(
            jnp.asarray(pts), jnp.ones(N, bool), jnp.asarray(rect), jnp.asarray(valid)
        )
    )
    for n in range(N):
        ix, iy = np.floor(pts[n])
        hits = [
            m
            for m in range(M)
            if valid[m]
            and rect[m, 0] <= ix <= rect[m, 2]
            and rect[m, 1] <= iy <= rect[m, 3]
        ][:4]
        want = hits + [-1] * (4 - len(hits))
        np.testing.assert_array_equal(cand[n], want, err_msg=f"track {n}")


def test_cold_start_finds_points():
    stream = SyntheticStream(n_points=120, seed=3)
    ext = MOVExtractor(threshold=25, capacity=2048)
    smv0 = stream.frame(0)
    assert smv0.ft == FrameType.I_FRAME
    st = ext.extract(smv0, None, None)
    d = st.to_numpy()
    # Each stamped visible patch should yield at least one nearby feature.
    uv, vis = stream._project(0)
    n_found = 0
    for i in np.flatnonzero(vis):
        dist = np.linalg.norm(d["pt"] - uv[i], axis=-1)
        if (dist < 16).any():
            n_found += 1
    assert n_found >= 0.7 * vis.sum(), (n_found, vis.sum())
    assert len(np.unique(d["track_id"])) == len(d["track_id"])  # unique ids


def test_pframe_propagation_tracks_points():
    stream = SyntheticStream(n_points=150, seed=5)
    ext = MOVExtractor(threshold=25, capacity=2048)

    smv = stream.frame(0)
    st = ext.extract(smv, None, None)
    prev_img = smv.im_gray
    first = st.to_numpy()

    # Associate first-frame tracks with their nearest foreground point.
    uv0, vis0 = stream._project(0)
    assoc = {}  # track_id -> (point index, initial pixel offset to the point)
    for tid, p in zip(first["track_id"], first["pt"]):
        d = np.linalg.norm(uv0 - p, axis=-1)
        i = int(np.argmin(d))
        if vis0[i] and d[i] < 4.0:
            assoc[int(tid)] = (i, p - uv0[i])
    assert len(assoc) >= 8  # enough foreground-locked tracks to measure

    prev_n = len(first["track_id"])
    for k in range(1, 6):
        smv = stream.frame(k)
        assert smv.ft == FrameType.P_FRAME
        assert smv.n_mvs > 1000  # macroblock grid tiles the frame
        assert smv.coverage_area > 0.9
        st = ext.extract(smv, st, prev_img)
        prev_img = smv.im_gray
        d = st.to_numpy()
        # Frame-over-frame survival: MV chaining keeps most tracks alive
        # (some thinning to one-track-per-destination-block is by design).
        surv = len(np.intersect1d(first["track_id"], d["track_id"])) if k == 1 else None
        prev_n = len(d["track_id"])

    d = st.to_numpy()
    # Tracks locked to a foreground point must keep their pixel offset to
    # that point's projection after 5 frames of MV chaining (drift < 2 px).
    uv5, vis5 = stream._project(5)
    checked = drifted = 0
    pos = {int(t): p for t, p in zip(d["track_id"], d["pt"])}
    for tid, (i, off0) in assoc.items():
        if tid in pos and vis5[i]:
            checked += 1
            if np.linalg.norm((pos[tid] - uv5[i]) - off0) > 2.0:
                drifted += 1
    assert checked >= 3, (checked, len(assoc))
    assert drifted == 0, (drifted, checked)

    # Ages increase for propagated tracks.
    assert d["age"].max() >= 5
