#!/usr/bin/env python
"""Stereo MOV-SLAM CLI (thin shim over movslam_tpu.cli.stereo_main).

Mirrors /root/reference/Examples/Stereo/stereo_video_tartan.cc: the stream is
frame-packed (interlaced L/R; right frames skip MV extraction,
stereo_video_tartan.cc:74-99). Args: `<settings.yaml> <stream>`.

`synthetic-stereo://n_frames=N,seed=S[,baseline_mm=B]` uses the fake decoder
with a rendered right view at the given baseline. Raw (unrectified) rigs —
configs with `Stereo.T_c1_c2`, e.g. configs/EuRoCStereo.yaml — are
rectified on the fly (core/stereo_rectified.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movslam_tpu.cli import stereo_main

if __name__ == "__main__":
    sys.exit(stereo_main(sys.argv))
