"""Measure the CPU reference baseline on this host.

Exports the bench's synthetic MV stream (io/synthetic.py, same generator,
same seed and frame count as bench.py) into a binary workload, builds and
runs tools/baseline_cpu.cc (the reference front-end hot loop re-executed
with the reference's own OpenCV solver calls — see the .cc header for the
full methodology), and writes BASELINE_MEASURED.json at the repo root.
bench.py reads that file to compute vs_baseline from a MEASURED number.

Usage: python tools/run_baseline.py [n_frames]
"""
import json
import os
import struct
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def export_workload(path, n_frames=200):
    from movslam_tpu.io.synthetic import SyntheticStream

    stream = SyntheticStream(n_points=400, seed=42)
    cam = stream.camera
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", n_frames, stream.height, stream.width))
        f.write(struct.pack("<4d", cam.fx, cam.fy, cam.cx, cam.cy))
        pts = np.asarray(stream.points, np.float64)
        f.write(struct.pack("<i", len(pts)))
        f.write(pts.tobytes())
        for k in range(n_frames):
            smv = stream.frame(k)
            R, t = stream.gt_pose(k)
            f.write(np.asarray(R, np.float64).tobytes())
            f.write(np.asarray(t, np.float64).tobytes())
            f.write(np.ascontiguousarray(smv.im_gray, np.uint8).tobytes())
            n = smv.n_mvs
            mv = np.concatenate(
                [
                    smv.mv_delta[:n], smv.mv_rect[:n],
                    smv.mv_dindx[:n, None].astype(np.float32),
                ],
                axis=1,
            ).astype(np.float32)
            f.write(struct.pack("<i", n))
            f.write(np.ascontiguousarray(mv).tobytes())
            nk = smv.n_kps
            f.write(struct.pack("<i", nk))
            f.write(np.ascontiguousarray(smv.kps_rect[:nk], np.float32).tobytes())
    return path


def build():
    exe = os.path.join(ROOT, "tools", "baseline_cpu")
    src = os.path.join(ROOT, "tools", "baseline_cpu.cc")
    if os.path.exists(exe) and os.path.getmtime(exe) > os.path.getmtime(src):
        return exe
    cflags = subprocess.run(
        ["pkg-config", "--cflags", "--libs", "opencv4"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    subprocess.run(
        ["g++", "-O2", "-std=c++17", src, "-o", exe] + cflags, check=True
    )
    return exe


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    wl = "/tmp/baseline_workload.bin"
    export_workload(wl, n)
    exe = build()
    out = subprocess.run([exe, wl], capture_output=True, text=True, check=True)
    res = json.loads(out.stdout.strip())
    res["host"] = os.uname().nodename
    res["n_frames"] = n
    res["method"] = (
        "reference front-end hot loop re-executed in C++ on the bench's "
        "synthetic stream: EXPRESS propagation/detection per crop, "
        "cv::solvePnPRansac USAC_MAGSAC x2/frame (TartanAir.yaml params), "
        "frustum gating; LBA = 10-iteration robust Schur-LM at the "
        "reference local problem size, timed separately (mapper thread). "
        "See tools/baseline_cpu.cc."
    )
    path = os.path.join(ROOT, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
