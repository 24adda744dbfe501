"""Multi-ref MV hop decomposition: differential test of the native decoder's
chain semantics against an independent Python model of the reference loop
(/root/reference/src/VideoDecoder.cc:211-348), plus an end-to-end check that
a synthetic multi-ref stream tracks through dropped intermediate frames."""
import ctypes
import os
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

_LIB_DIR = os.path.join(
    os.path.dirname(__file__), "..", "movslam_tpu", "native", "decoder"
)
_LIB = os.path.abspath(os.path.join(_LIB_DIR, "libmvdecoder.so"))


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(_LIB):
        subprocess.run(["bash", os.path.join(_LIB_DIR, "build.sh")], check=True)
    lib = ctypes.CDLL(_LIB)
    lib.mvdec_test_decompose.restype = ctypes.c_float
    lib.mvdec_test_decompose.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float32), np.ctypeslib.ndpointer(np.int32),
        ctypes.c_int, ctypes.c_int,
    ]
    return lib


def run_native(lib, W, H, n_queue, mvs, cap_mv=64, cap_kp=64):
    n = len(mvs)
    src = np.array([[m["src_x"], m["src_y"]] for m in mvs], np.float32)
    dst = np.array([[m["dst_x"], m["dst_y"]] for m in mvs], np.float32)
    wh = np.array([[m["w"], m["h"]] for m in mvs], np.float32)
    ref = np.array([m["ref"] for m in mvs], np.int32)
    source = np.array([m.get("source", -1) for m in mvs], np.int32)
    nf = n_queue + 1
    out_mv = np.zeros((nf, cap_mv, 7), np.float32)
    out_nmv = np.zeros(nf, np.int32)
    out_kp = np.zeros((nf, cap_kp, 4), np.float32)
    out_nkp = np.zeros(nf, np.int32)
    cov = lib.mvdec_test_decompose(
        W, H, n_queue, src.reshape(-1), dst.reshape(-1), wh.reshape(-1),
        ref, source, n, out_mv.reshape(-1), out_nmv, out_kp.reshape(-1),
        out_nkp, cap_mv, cap_kp,
    )
    return out_mv, out_nmv, out_kp, out_nkp, cov


def reference_model(W, H, n_queue, mvs):
    """Independent NumPy port of VideoDecoder.cc:211-348 (the oracle)."""
    frames = [
        {"mv": [], "kp": []} for _ in range(n_queue + 1)
    ]  # last = current
    cov = 0.0
    for m in mvs:
        if m.get("source", -1) > 0:
            continue
        ref = m["ref"]
        w, h = m["w"], m["h"]
        hw, hh = w / 2, h / 2
        dx = (m["dst_x"] - m["src_x"]) / (ref + 1)
        dy = (m["dst_y"] - m["src_y"]) / (ref + 1)
        kx = m["src_x"] if ref > 0 else m["dst_x"]
        ky = m["src_y"] if ref > 0 else m["dst_y"]
        x0, y0 = max(kx - hw, 0), max(ky - hh, 0)
        if kx + hw >= W or ky + hh >= H:
            continue
        dindx = -1
        if ref > 0:
            if ref < n_queue:
                frames[n_queue - 1 - ref]["kp"].append((x0, y0, w, h))
        else:
            frames[n_queue]["kp"].append((x0, y0, w, h))
            dindx = len(frames[n_queue]["kp"]) - 1
        for j in range(ref + 1, 0, -1):
            sx = m["dst_x"] - dx * j
            sy = m["dst_y"] - dy * j
            sx0, sy0 = max(sx - hw, 0), max(sy - hh, 0)
            sx1, sy1 = min(sx + hw, W - 1), min(sy + hh, H - 1)
            if j == 1:
                tgt = frames[n_queue]
            else:
                if j - 1 > n_queue:
                    continue
                tgt = frames[n_queue - (j - 1)]
            tgt["mv"].append((dx, dy, sx0, sy0, sx1, sy1, dindx))
        cov += w * h
    return frames, cov


CASES = [
    # single-hop P MV (ref=0)
    [dict(src_x=100, src_y=100, dst_x=104, dst_y=102, w=16, h=16, ref=0)],
    # ref=1: two hops, one on current, one on the newest queued frame
    [dict(src_x=100, src_y=100, dst_x=108, dst_y=104, w=16, h=16, ref=1)],
    # ref=3: four hops spread over three queued frames + current
    [dict(src_x=200, src_y=150, dst_x=216, dst_y=158, w=16, h=16, ref=3)],
    # mix, including an 8x8 partition, a clipped block, a B-frame fwd ref
    [
        dict(src_x=50, src_y=60, dst_x=52, dst_y=61, w=8, h=8, ref=0),
        dict(src_x=630, src_y=470, dst_x=638, dst_y=478, w=16, h=16, ref=0),
        dict(src_x=300, src_y=200, dst_x=312, dst_y=206, w=16, h=16, ref=2),
        dict(src_x=10, src_y=10, dst_x=14, dst_y=12, w=16, h=16, ref=1, source=1),
    ],
    # chain starting before the queue (ref exceeds queue depth)
    [dict(src_x=100, src_y=100, dst_x=140, dst_y=120, w=16, h=16, ref=5)],
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_decompose_matches_reference_model(lib, case):
    W, H, n_queue = 640, 480, 4
    mvs = CASES[case]
    out_mv, out_nmv, out_kp, out_nkp, cov = run_native(lib, W, H, n_queue, mvs)
    frames, cov_ref = reference_model(W, H, n_queue, mvs)
    assert cov == pytest.approx(cov_ref)
    for f in range(n_queue + 1):
        exp_mv = np.array(frames[f]["mv"], np.float32).reshape(-1, 7)
        exp_kp = np.array(frames[f]["kp"], np.float32).reshape(-1, 4)
        assert out_nmv[f] == len(exp_mv), f"frame {f} mv count"
        assert out_nkp[f] == len(exp_kp), f"frame {f} kp count"
        np.testing.assert_allclose(out_mv[f, : len(exp_mv)], exp_mv, atol=1e-5)
        np.testing.assert_allclose(out_kp[f, : len(exp_kp)], exp_kp, atol=1e-5)


def test_multiref_chain_tracks_through_intermediate_frames():
    """A track whose MV evidence arrives ONLY as ref=2 multi-ref vectors (the
    intermediate frames carry no direct MVs of their own) must still
    propagate hop by hop, because the decomposition assigns each hop to the
    right intermediate frame (VideoDecoder.cc:287-325)."""
    import jax.numpy as jnp

    from movslam_tpu.core.extractor import MOVExtractor
    from movslam_tpu.io.mvimage import FrameType, MotionVectorImage
    from movslam_tpu.io.synthetic import SyntheticStream

    rng = np.random.default_rng(3)
    stream = SyntheticStream(n_points=200, seed=3)

    # Frame 0: I-frame cold start.
    img0, pts0, vis0 = stream.render(0)
    smv0 = MotionVectorImage.empty(640, 480)
    smv0.im_gray = img0
    smv0.ft = FrameType.I_FRAME
    ex = MOVExtractor(threshold=20)
    st = ex.extract(smv0, None, None)
    n0 = int(np.sum(np.asarray(st.valid)))
    assert n0 > 50

    # Frames 1..3: per-frame motion delta (2, 1); the evidence arrives as one
    # ref=2 MV per block decoded "at frame 3", decomposed into 3 hops.
    delta = np.array([2.0, 1.0], np.float32)
    smvs = []
    for k in (1, 2, 3):
        img = np.roll(np.roll(img0, int(k * delta[1]), axis=0), int(k * delta[0]), axis=1)
        smv = MotionVectorImage.empty(640, 480)
        smv.im_gray = img
        smv.ft = FrameType.P_FRAME
        smvs.append(smv)

    # Decompose: each 16x16 block's ref=2 MV gives hops for frames 1, 2, 3.
    for by in range(8, 472, 16):
        for bx in range(8, 632, 16):
            dst = np.array([bx, by], np.float32) + 3 * delta
            if dst[0] + 8 >= 640 or dst[1] + 8 >= 480:
                continue
            for j, smv in zip((3, 2, 1), smvs):
                src = dst - j * delta
                x0, y0 = max(src[0] - 8, 0), max(src[1] - 8, 0)
                x1, y1 = min(src[0] + 8, 639), min(src[1] + 8, 479)
                smv.add_mv(delta, (x0, y0, x1, y1), -1)
    for smv in smvs:
        smv.coverage_area = 0.9

    prev_img = img0
    prev = st
    ids0 = np.asarray(prev.track_id)[np.asarray(prev.valid)]
    for smv in smvs:
        prev = ex.extract(smv, prev, prev_img)
        prev_img = smv.im_gray
    v = np.asarray(prev.valid)
    ids3 = np.asarray(prev.track_id)[v]
    survived = np.intersect1d(ids0, ids3)
    assert len(survived) > 0.5 * n0, (len(survived), n0)
    # Positions moved by ~3 * delta.
    pt0 = np.asarray(st.pt)[np.asarray(st.valid)]
    pt3 = np.asarray(prev.pt)[v]
    id_to_pt0 = {int(t): p for t, p in zip(ids0, pt0)}
    moved = np.array([pt3[i] - id_to_pt0[int(t)] for i, t in enumerate(ids3) if int(t) in id_to_pt0])
    med = np.median(moved, axis=0)
    np.testing.assert_allclose(med, 3 * delta, atol=1.0)


# ---------------------------------------------------------------------------
# REAL multi-ref ingest: encode ref=4 CAVLC H.264 with libx264, recover the
# per-block reference indices with the h264_refidx sidecar parser (stock
# libavcodec — the reference needs a patched FFmpeg for this,
# ffmpeg-ref-patch.patch:122-129), and check the decoder's hop decomposition
# against the known ground-truth motion.


def _flicker_stream(path, n=40, shift=2):
    """Period-2 texture flicker + constant horizontal motion: every block in
    frame t matches frame t-2 (same texture) far better than t-1, so x264
    picks list positions 1/3 (2 or 4 frames back) for nearly every MB."""
    from movslam_tpu.io.video import encode_gray

    rng = np.random.default_rng(1)
    H, W = 480, 640
    texs = []
    for _ in range(2):
        t = rng.integers(0, 255, (H, 2 * W), np.uint8).astype(np.float32)
        t = (t + np.roll(t, 1, 0) + np.roll(t, 1, 1) + np.roll(t, 2, 1)) / 4
        texs.append(t.astype(np.uint8))
    frames = np.stack(
        [np.roll(texs[k % 2], -shift * k, axis=1)[:, :W] for k in range(n)]
    )
    encode_gray(path, frames, refs=4, cavlc=True)


def test_refidx_parser_full_coverage_and_multiref(tmp_path):
    """Structural check of the CAVLC parser: every P access unit parses to
    the exact end of its slice data (any macroblock mis-parse desyncs CAVLC
    immediately, so full MB coverage == bit-exact syntax walk), and the
    flicker stream really exercises ref > 0."""
    from movslam_tpu.io.video import refidx_scan

    path = str(tmp_path / "flicker_ref4.mp4")
    _flicker_stream(path)
    s = refidx_scan(path)
    assert len(s) == 40
    p_rows = s[1:]  # row 0 is the IDR
    assert (p_rows[:, 0] == 1).all(), "unparsed P access units"
    assert (p_rows[:, 1] == 40 * 30).all(), "incomplete MB coverage"
    assert p_rows[:, 11].sum() == 0, "ref indices out of range"
    hist = p_rows[:, 3:11].sum(0)
    # periods-2 flicker: matches live 2 or 4 frames back (hops-1 = 1 or 3)
    assert hist[1] + hist[3] > 0.8 * hist.sum(), hist


def test_real_multiref_stream_decodes_to_per_hop_deltas(tmp_path):
    """End-to-end: VideoDecoder on a REAL ref=4 encode recovers per-hop
    deltas of (-shift, 0) — only possible when the recovered reference index
    divides each multi-ref MV across its hops (VideoDecoder.cc:287-348).
    Without the ref-index sidecar the same MVs would read -2*shift or
    -4*shift per hop."""
    from movslam_tpu.io.mvimage import FrameType
    from movslam_tpu.io.video import VideoDecoder

    shift = 2
    path = str(tmp_path / "flicker_ref4.mp4")
    _flicker_stream(path, shift=shift)
    dec = VideoDecoder(path)
    dec.init()
    per_frame_med = []
    bad_hops = total = 0
    for smv in dec:
        if smv.ft != FrameType.P_FRAME or smv.n_mvs < 100:
            continue
        d = smv.mv_delta[: smv.n_mvs]
        per_frame_med.append(np.median(d, axis=0))
        # per-hop deltas must cluster at (-shift, 0), not multiples of it
        err = np.abs(d - np.array([-shift, 0.0], np.float32))
        bad_hops += int(np.sum(err.max(axis=1) > 1.0))
        total += len(d)
    dec.close()
    assert len(per_frame_med) > 30
    med = np.median(np.stack(per_frame_med), axis=0)
    np.testing.assert_allclose(med, [-shift, 0.0], atol=0.5)
    assert bad_hops < 0.05 * total, (bad_hops, total)
