"""VideoDecoder: Python wrapper over the native FFmpeg MV decoder.

L1 of the stack (SURVEY.md §2.1): the codec boundary stays host-side native
(libmvdecoder.so, movslam_tpu/native/decoder/mv_decoder.cc), mirroring the
reference's VideoDecoder API (/root/reference/include/VideoDecoder.h:31-42):
`VideoDecoder(path, qlen)`, `init()`, `next_image(mv)` ->
MotionVectorImage | None.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .mvimage import FrameType, MotionVectorImage

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "decoder")
_LIB_PATH = os.path.abspath(os.path.join(_LIB_DIR, "libmvdecoder.so"))


class _MvFrameView(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("frame_no", ctypes.c_int32),
        ("ft", ctypes.c_int32),
        ("timestamp", ctypes.c_double),
        ("coverage", ctypes.c_float),
        ("gray", ctypes.POINTER(ctypes.c_uint8)),
        ("n_mvs", ctypes.c_int32),
        ("n_kps", ctypes.c_int32),
        ("mv_delta", ctypes.POINTER(ctypes.c_float)),
        ("mv_rect", ctypes.POINTER(ctypes.c_float)),
        ("mv_dindx", ctypes.POINTER(ctypes.c_int32)),
        ("kps_rect", ctypes.POINTER(ctypes.c_float)),
        ("mv_dropped", ctypes.c_int32),
        ("kp_dropped", ctypes.c_int32),
        ("rgb", ctypes.POINTER(ctypes.c_uint8)),
        ("n_bmvs", ctypes.c_int32),
        ("bmv_delta", ctypes.POINTER(ctypes.c_float)),
        ("bmv_rect", ctypes.POINTER(ctypes.c_float)),
    ]


def _load_lib(auto_build=True):
    if not os.path.exists(_LIB_PATH) and auto_build:
        build = os.path.join(_LIB_DIR, "build.sh")
        try:
            subprocess.run(["bash", build], check=True, capture_output=True)
        except subprocess.CalledProcessError as e:
            raise RuntimeError(
                f"native decoder build failed:\n{e.stderr.decode()[:2000]}"
            ) from e
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mvdec_open.restype = ctypes.c_void_p
    lib.mvdec_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.mvdec_error.restype = ctypes.c_char_p
    lib.mvdec_error.argtypes = [ctypes.c_void_p]
    lib.mvdec_next.restype = ctypes.POINTER(_MvFrameView)
    lib.mvdec_next.argtypes = [ctypes.c_void_p]
    lib.mvdec_width.restype = ctypes.c_int
    lib.mvdec_width.argtypes = [ctypes.c_void_p]
    lib.mvdec_height.restype = ctypes.c_int
    lib.mvdec_height.argtypes = [ctypes.c_void_p]
    lib.mvdec_fps.restype = ctypes.c_double
    lib.mvdec_fps.argtypes = [ctypes.c_void_p]
    lib.mvdec_close.argtypes = [ctypes.c_void_p]
    lib.mvdec_set_rgb.argtypes = [ctypes.c_void_p, ctypes.c_int]
    return lib


def encode_gray(path, frames, fps=30.0, keyint=1000, refs=2, bframes=0,
                cavlc=False):
    """Encode a (N, H, W) uint8 stack with libx264 at the reference operating
    point (README.md:47-69: preset fast, tune film, p8x8/p4x4 partitions,
    me=umh, merange=64, subme=6, bframes=0) — test/utility entry point (the
    reference encodes on a separate host with the ffmpeg CLI). bframes > 0
    exercises the decoder's B-frame branch. cavlc=True encodes with CAVLC
    entropy coding, letting the h264_refidx sidecar parser recover per-block
    reference indices (the multi-ref ingest path) with stock libavcodec."""
    lib = _load_lib()
    lib.mvenc_encode_gray2.restype = ctypes.c_int
    lib.mvenc_encode_gray2.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.uint8), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w = frames.shape
    rc = lib.mvenc_encode_gray2(
        str(path).encode(), frames.reshape(-1), w, h, n, float(fps),
        int(keyint), int(refs), int(bframes), int(bool(cavlc)),
    )
    if rc != 0:
        raise RuntimeError(f"mvenc_encode_gray failed rc={rc}")


def refidx_scan(path, cap=512):
    """Run ONLY the CAVLC ref-index sidecar parser over a file's packets.

    Returns an (n, 12) int32 array per access unit:
    [parsed, n_mbs, n_intra_blocks, hist_ref0..hist_ref7, overflow] where
    hist_refK counts 8x8 blocks recovered as `hops-1 == K`. Structural test
    hook for h264_refidx.cc."""
    lib = _load_lib()
    lib.mvdec_refidx_scan.restype = ctypes.c_int
    lib.mvdec_refidx_scan.argtypes = [
        ctypes.c_char_p, np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
    ]
    out = np.zeros((cap, 12), np.int32)
    n = lib.mvdec_refidx_scan(str(path).encode(), out.reshape(-1), cap)
    if n < 0:
        raise RuntimeError(f"mvdec_refidx_scan failed rc={n}")
    return out[:n]


class VideoDecoder:
    """Streaming MV decoder. `next_image(mv=True)` pops the oldest lookahead
    frame; `mv=False` skips MV conversion cost on the Python side (used for
    the right frames of frame-packed stereo)."""

    def __init__(self, url, qlen=12, max_mvs=8192, max_kps=4096, rgb=False):
        self.url = url
        self.qlen = qlen
        # RGB surface (VideoBase::avframeToCvmatRGB, VideoBase.h:60-68):
        # decoded alongside gray when enabled; the viewer overlays on it.
        self.rgb = rgb
        # Python-side array capacities (static device shapes). The native
        # decoder caps at 16384/8192 and counts its own drops; both layers
        # log truncation instead of dropping silently.
        self.max_mvs = max_mvs
        self.max_kps = max_kps
        self._warned_drop = False
        self._lib = None
        self._h = None
        self.width = 0
        self.height = 0
        self.fps = 30.0

    def init(self):
        self._lib = _load_lib()
        self._h = self._lib.mvdec_open(self.url.encode(), self.qlen)
        err = self._lib.mvdec_error(self._h)
        if err:
            raise RuntimeError(f"VideoDecoder: {err.decode()} ({self.url})")
        self.width = self._lib.mvdec_width(self._h)
        self.height = self._lib.mvdec_height(self._h)
        self.fps = self._lib.mvdec_fps(self._h)
        if self.rgb:
            self._lib.mvdec_set_rgb(self._h, 1)
        return True

    def next_image(self, mv=True):
        vp = self._lib.mvdec_next(self._h)
        if not vp:
            return None
        v = vp.contents
        smv = MotionVectorImage.empty(v.width, v.height, self.max_mvs, self.max_kps)
        smv.frame_no = v.frame_no
        smv.timestamp = v.timestamp
        smv.ft = FrameType(v.ft)
        smv.im_gray = np.ctypeslib.as_array(
            v.gray, shape=(v.height, v.width)
        ).copy()
        if v.rgb:
            smv.im_rgb = np.ctypeslib.as_array(
                v.rgb, shape=(v.height, v.width, 3)
            ).copy()
        if mv:
            n_mvs = min(v.n_mvs, self.max_mvs)
            n_kps = min(v.n_kps, self.max_kps)
            dropped = (v.n_mvs - n_mvs) + (v.n_kps - n_kps) + v.mv_dropped + v.kp_dropped
            if dropped and not self._warned_drop:
                from ..core.verbose import Verbose

                Verbose.log(
                    f"VideoDecoder: frame {v.frame_no} dropped {dropped} "
                    f"MV/keypoint records over capacity "
                    f"(n_mvs={v.n_mvs}, n_kps={v.n_kps}); further drops "
                    f"not logged"
                )
                self._warned_drop = True
            if n_mvs:
                smv.mv_delta[:n_mvs] = np.ctypeslib.as_array(
                    v.mv_delta, shape=(v.n_mvs, 2)
                )[:n_mvs]
                smv.mv_rect[:n_mvs] = np.ctypeslib.as_array(
                    v.mv_rect, shape=(v.n_mvs, 4)
                )[:n_mvs]
                smv.mv_dindx[:n_mvs] = np.ctypeslib.as_array(
                    v.mv_dindx, shape=(v.n_mvs,)
                )[:n_mvs]
                smv.n_mvs = n_mvs
            if n_kps:
                smv.kps_rect[:n_kps] = np.ctypeslib.as_array(
                    v.kps_rect, shape=(v.n_kps, 4)
                )[:n_kps]
                smv.n_kps = n_kps
            smv.coverage_area = float(v.coverage)
            if v.n_bmvs:
                smv.n_bmvs = v.n_bmvs
                smv.bmv_delta = np.ctypeslib.as_array(
                    v.bmv_delta, shape=(v.n_bmvs, 2)
                ).copy()
                smv.bmv_rect = np.ctypeslib.as_array(
                    v.bmv_rect, shape=(v.n_bmvs, 4)
                ).copy()
        return smv

    def __iter__(self):
        while True:
            smv = self.next_image(True)
            if smv is None:
                return
            yield smv

    def close(self):
        if self._h:
            self._lib.mvdec_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
