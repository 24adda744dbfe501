#!/usr/bin/env python
"""Monocular MOV-SLAM CLI (thin shim over movslam_tpu.cli.mono_main).

Mirrors the reference binary
(/root/reference/Examples/Monocular/mono_video_tartan.cc): args are
`<settings.yaml> <stream>`; the loop decodes MV frames, tracks each one, and
on shutdown writes TrajectoryKITTIKeyFrame.txt, TrajectoryEUROC.txt and
results.txt = `imageCnt,totalLost,avg_ms`.

`<stream>` forms:
  synthetic://n_frames=N,seed=S[,n_points=P]   ground-truth fake decoder
  <path.mp4 | mpegts | tcp://host:port>        native FFmpeg decoder (if built)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movslam_tpu.cli import mono_main

if __name__ == "__main__":
    sys.exit(mono_main(sys.argv))
