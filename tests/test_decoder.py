"""Native FFmpeg MV decoder: build + decode an encoded synthetic video."""
import os

import numpy as np
import pytest

from movslam_tpu.io.synthetic import SyntheticStream

pytestmark = pytest.mark.smoke

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def encoded_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "mv.avi")
    stream = SyntheticStream(n_points=150, seed=9)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (640, 480), False)
    assert vw.isOpened()
    for k in range(20):
        img, _, _ = stream.render(k)
        vw.write(img)
    vw.release()
    return path, stream


def test_native_decoder_builds_and_decodes(encoded_video):
    path, stream = encoded_video
    from movslam_tpu.io.video import VideoDecoder
    from movslam_tpu.io.mvimage import FrameType

    dec = VideoDecoder(path, qlen=12)
    dec.init()
    assert (dec.width, dec.height) == (640, 480)

    frames = list(dec)
    assert len(frames) == 20
    assert frames[0].ft == FrameType.I_FRAME
    p_frames = [f for f in frames if f.ft == FrameType.P_FRAME]
    assert len(p_frames) >= 15
    # Macroblock MVs tile the frame on P-frames.
    for f in p_frames[:5]:
        assert f.n_mvs > 500, f.n_mvs
        assert f.n_kps > 500
        assert f.coverage_area > 0.5
        # dst-block back-pointers are in range
        d = f.mv_dindx[: f.n_mvs]
        assert d.max() < f.n_kps
        # source rects are inclusive in-bounds boxes
        r = f.mv_rect[: f.n_mvs]
        assert (r[:, 0] >= 0).all() and (r[:, 2] <= 639).all()
        assert (r[:, 0] <= r[:, 2]).all() and (r[:, 1] <= r[:, 3]).all()

    # Gray content matches the rendered source (codec-lossy).
    img0, _, _ = stream.render(0)
    diff = np.abs(frames[0].im_gray.astype(float) - img0.astype(float))
    assert diff.mean() < 8.0, diff.mean()


def test_decoder_error_on_missing_file():
    from movslam_tpu.io.video import VideoDecoder

    dec = VideoDecoder("/nonexistent/file.mp4")
    with pytest.raises(RuntimeError, match="failed to open"):
        dec.init()


def test_h264_operating_point_decode(tmp_path):
    """Encode with REAL libx264 at the reference operating point (keyint=1000,
    ref=2, p8x8/p4x4 partitions, me=umh — README.md:47-69) via the native
    encoder helper, then decode: P-frames must produce dense MV records with
    in-range back-pointers and high coverage."""
    from movslam_tpu.io.video import VideoDecoder, encode_gray
    from movslam_tpu.io.mvimage import FrameType

    stream = SyntheticStream(n_points=150, seed=4)
    frames = np.stack([stream.render(k)[0] for k in range(20)])
    path = str(tmp_path / "x264.mp4")
    encode_gray(path, frames, fps=30.0, keyint=1000, refs=2)

    dec = VideoDecoder(path, qlen=12)
    dec.init()
    out = list(dec)
    assert len(out) == 20
    assert out[0].ft == FrameType.I_FRAME
    p = [f for f in out if f.ft == FrameType.P_FRAME]
    assert len(p) == 19  # keyint=1000: single leading I-frame
    dense = [f for f in p if f.n_mvs > 300]
    assert len(dense) >= 10, [f.n_mvs for f in p]
    for f in dense[:5]:
        assert f.coverage_area > 0.3
        d = f.mv_dindx[: f.n_mvs]
        assert d.max() < max(f.n_kps, 1)
        r = f.mv_rect[: f.n_mvs]
        assert (r[:, 0] >= 0).all() and (r[:, 2] <= 639).all()
        assert (r[:, 0] <= r[:, 2]).all() and (r[:, 1] <= r[:, 3]).all()


def test_bframe_branch_and_rgb(tmp_path):
    """B-frame branch (VideoDecoder.cc:255-286): bframes>0 streams classify
    ft=B and collect forward-prediction records (the reference's bmap);
    RGB surface parity (VideoBase.h:60-68)."""
    from movslam_tpu.io.video import VideoDecoder, encode_gray
    from movslam_tpu.io.mvimage import FrameType

    rng = np.random.default_rng(1)
    H, W, N = 120, 160, 30
    base = rng.integers(0, 255, (H * 2, W * 2)).astype(np.uint8)
    frames = np.stack([base[k : k + H, k : k + W] for k in range(N)])
    path = str(tmp_path / "btest.mp4")
    encode_gray(path, frames, fps=30.0, keyint=1000, refs=2, bframes=2)

    dec = VideoDecoder(path, qlen=6, rgb=True)
    dec.init()
    counts = {0: 0, 1: 0, 2: 0}
    n_bmv_total = 0
    n_rgb = 0
    for smv in dec:
        counts[int(smv.ft)] += 1
        n_bmv_total += smv.n_bmvs
        if smv.im_rgb is not None:
            assert smv.im_rgb.shape == (H, W, 3)
            lum = smv.im_rgb.mean(2)
            assert np.corrcoef(lum.ravel(), smv.im_gray.ravel())[0, 1] > 0.95
            n_rgb += 1
        if smv.n_bmvs:
            assert smv.ft == FrameType.B_FRAME
            assert smv.bmv_delta.shape == (smv.n_bmvs, 2)
            assert smv.bmv_rect.shape == (smv.n_bmvs, 4)
    dec.close()
    assert counts[2] > 0, "no B-frames decoded"
    assert n_bmv_total > 0, "no forward-prediction records collected"
    assert n_rgb == sum(counts.values())
