"""Benchmark: tracked frames/sec of the full mono SLAM pipeline on TPU.

Runs the complete per-frame path (MV track propagation, trackid matching,
PnP-RANSAC x2, keyframe/mapping work including Schur-LM local BA) on a
pre-generated synthetic MV stream and reports steady-state throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference's real-time operating point (30 fps
TartanAir stream on CPU, /root/reference/README.md:47; BASELINE.md targets
>= 10x CPU frame rate).
"""
import json
import signal
import sys
import time

import numpy as np

# Partial-result insurance: the driver bounds bench runs with a timeout
# (SIGTERM). Round 4's cold-cache run was killed mid-compile and recorded
# NOTHING; now any timed segment that finished before the signal still gets
# reported as a parseable JSON line on the way out.
_PARTIAL = {"seg_fps": []}


def _emit_partial(signum, frame):
    seg = _PARTIAL["seg_fps"]
    if seg:
        srt = sorted(seg)
        fps = srt[len(srt) // 2]
        base = _baseline()[0]
        print(
            json.dumps(
                {
                    "metric": "tracked frames/sec (full mono SLAM, synthetic 640x480 MV stream)",
                    "value": round(fps, 2),
                    "unit": "frames/sec",
                    "vs_baseline": round(fps / base, 3),
                    "extra": {
                        "partial": f"timed out after {len(seg)} segment(s)",
                        "segment_fps": [round(f, 2) for f in seg],
                    },
                }
            ),
            flush=True,
        )
    sys.exit(124)


def _baseline():
    """(baseline_fps, description): the measured CPU front-end rate from
    tools/run_baseline.py (reference hot loop re-executed with its own
    OpenCV solver calls on this host), falling back to the 30 fps real-time
    operating point the reference paces itself to
    (mono_video_tartan.cc:73-93)."""
    baseline_fps, baseline_src = 30.0, "30fps stream pacing (not measured)"
    try:
        with open(__file__.replace("bench.py", "BASELINE_MEASURED.json")) as f:
            meas = json.load(f)
        baseline_fps = float(meas["fps"])
        baseline_src = (
            f"measured CPU front-end: {meas['mean_track_ms']:.1f} ms/frame "
            f"({baseline_fps:.1f} fps), lba {meas['lba_ms_per_iter']:.1f} "
            f"ms/iter (tools/baseline_cpu.cc)"
        )
    except (OSError, KeyError, ValueError):
        pass
    return baseline_fps, baseline_src


def main():
    signal.signal(signal.SIGTERM, _emit_partial)
    signal.signal(signal.SIGINT, _emit_partial)

    import jax

    # Persistent compile cache (hits across bench runs; first run pays).
    jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from movslam_tpu.core.system import System
    from movslam_tpu.core.verbose import Verbose
    from movslam_tpu.config.settings import Settings, MONOCULAR
    from movslam_tpu.core.camera import Pinhole
    from movslam_tpu.io.synthetic import SyntheticStream
    from movslam_tpu.utils.prewarm import prewarm_windowed_mono

    Verbose.level = Verbose.QUIET

    # Cold-cache insurance: compile the drive's big device programs (window
    # variants, per-frame program, mapper size classes) in PARALLEL worker
    # threads BEFORE any other device work. The backend compiles
    # concurrently (measured wall = max, not sum), so a fully cold
    # remote-compile start costs ~one big-program compile instead of their
    # sum; warm runs hit the persistent cache and this returns in seconds.
    # Blocking on purpose: concurrent compile threads are safe, but
    # compile-in-thread while the main thread EXECUTES programs wedged the
    # tunneled runtime (measured hang -> SIGTERM -> native abort).
    prewarm_windowed_mono((2, 4, 8), verbose=False)

    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = MONOCULAR

    stream = SyntheticStream(n_points=400, seed=42)
    # Timed region long enough to average over the 8-frame window / keyframe
    # cycle and the occasional thin-margin rewind; warmup runs the map past
    # maturity (~10 KFs) so deferred mapping + KF-aligned windows are active.
    # THREE timed segments, median reported: the tunneled TPU link shows
    # transient multi-second stalls (measured 41 -> 20 fps run-to-run on
    # identical code); the median filters single-segment hiccups while still
    # reflecting sustained throughput.
    n_warm, n_timed, n_seg = 48, 160, 3
    frames = [stream.frame(k) for k in range(n_warm + n_seg * n_timed)]

    # Pipelined windowed drive: W-frame batches (the decoder's lookahead
    # queue always holds a window, VideoDecoder.cc:163-368) through the
    # W-frames-per-dispatch program (ops/window_step), with flush=False so
    # window k+1 executes on device while window k replays on the host and
    # the deferred mapper (fused triangulation+BA, ops/mapper_step) overlaps
    # the frames in between. Warmup runs the map past maturity (~10 KFs) so
    # the timed region measures the steady state.
    system = System(s, MONOCULAR)
    W = system.window
    items = [(f.timestamp, f) for f in frames]
    k = 0
    while k < n_warm:
        system.track_monocular_batch(items[k : k + W], flush=False)
        k += W
    system.track_monocular_batch([], flush=True)

    seg_fps = []
    for s in range(n_seg):
        seg_end = n_warm + (s + 1) * n_timed
        t0 = time.perf_counter()
        while k < seg_end:
            system.track_monocular_batch(items[k : k + W], flush=False)
            k += W
        system.track_monocular_batch([], flush=True)
        dt = time.perf_counter() - t0
        seg_fps.append(n_timed / dt)
        _PARTIAL["seg_fps"] = list(seg_fps)
    system.shutdown()

    seg_fps.sort()
    fps = seg_fps[len(seg_fps) // 2]
    dt = n_timed / fps
    lost = system.get_total_lost()

    # Scale-aligned ATE against the stream's ground truth (the BASELINE.md
    # accuracy metric), computed from the saver-semantics trajectory.
    from evaluation.evaluator import umeyama_alignment

    est, gt = [], []
    for ts, R, t, lost_f in system.frame_trajectory():
        est.append(-(R.T @ t))
        R_gt, t_gt = stream.gt_pose(round(ts * 30.0))
        gt.append(-(R_gt.T @ t_gt))
    est, gt = np.array(est), np.array(gt)
    sc, Ra, ta = umeyama_alignment(gt, est, with_scale=True)
    resid = gt - (sc * est @ Ra.T + ta)
    ate = float(np.sqrt(np.mean(np.sum(resid**2, axis=1))))
    span = float(np.linalg.norm(np.ptp(gt, axis=0)))

    # Per-keyframe fused mapper cost (triangulation + local BA dispatch) —
    # the BASELINE.md lba_ms row.
    lba = sorted(system.mapper.lba_ms)
    lba_ms = lba[len(lba) // 2] if lba else None

    baseline_fps, baseline_src = _baseline()

    print(
        json.dumps(
            {
                "metric": "tracked frames/sec (full mono SLAM, synthetic 640x480 MV stream)",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / baseline_fps, 3),
                "extra": {
                    "segment_fps": [round(f, 2) for f in seg_fps],
                    "mean_track_ms": round(1e3 * dt / n_timed, 2),
                    "lost_frames": lost,
                    "keyframes": system.atlas.current.n_keyframes(),
                    "culled_keyframes": system.mapper.n_culled_kfs,
                    "mappoints": system.atlas.current.n_mappoints(),
                    "ate_rmse_m": round(ate, 4),
                    "ate_pct_of_span": round(100 * ate / span, 2),
                    "mapper_ms_per_kf": round(lba_ms, 2) if lba_ms else None,
                    "baseline": baseline_src,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
