"""Package CLI entry points (the reference's example binaries).

Mirrors /root/reference/Examples/Monocular/mono_video_tartan.cc and
Examples/Stereo/stereo_video_tartan.cc: `<settings.yaml> <stream>` in, and
TrajectoryKITTIKeyFrame.txt / TrajectoryEUROC.txt / results.txt
(`imageCnt,totalLost,avg_ms`, mono_video_tartan.cc:105-115) out. Installed
as `mov-slam-mono` / `mov-slam-stereo` (pyproject scripts); the repo's
`apps/*.py` are thin shims over these.

Stream forms:
  synthetic://n_frames=N,seed=S[,n_points=P]        ground-truth fake decoder
  synthetic-stereo://n_frames=N,seed=S[,baseline_mm=B]
  <path.mp4 | .ts | tcp://host:port>                native FFmpeg decoder

Flags: --realtime (1/fps pacing, per-frame dispatch;
mono_video_tartan.cc:73-93), --viewer <dir> (headless PNG stream),
--cpu (force the CPU backend for local verification).
"""
from __future__ import annotations

import sys
import time


def _maybe_cpu(argv):
    if "--cpu" in argv:
        # Local verification: force the CPU backend + persistent compile
        # cache. The tunneled-TPU plugin must not stay in-process for CPU
        # runs (its shared library corrupts some CPU XLA executables at
        # run time — see movslam_tpu/utils/cpuexec.py), so re-exec
        # plugin-free first (no-op when already clean).
        from .utils.cpuexec import ensure_plugin_free_cpu

        ensure_plugin_free_cpu()
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def open_stream(url, fps_hint=30.0):
    """Mono stream: yields MotionVectorImage frames."""
    if url.startswith("synthetic://"):
        from .io.synthetic import SyntheticStream

        kwargs = {}
        if url != "synthetic://":
            for kv in url[len("synthetic://"):].split(","):
                if not kv:
                    continue
                k, v = kv.split("=")
                kwargs[k] = int(v)
        n_frames = kwargs.pop("n_frames", 300)
        stream = SyntheticStream(fps=fps_hint, **kwargs)
        return stream.frames(n_frames), n_frames
    from .io.video import VideoDecoder

    dec = VideoDecoder(url, qlen=12)
    dec.init()
    return iter(dec), None


def open_vi_stream(url, fps_hint=30.0):
    """Visual-inertial stream: yields (ts, smv, imu) triples.
    `synthetic-vi://n_frames=N,seed=S` is the fake decoder + analytic IMU
    (io/synthetic_vi.py); real capture would pair the video decoder with an
    IMU CSV, which BASELINE config 5 leaves to the dataset harness."""
    if not url.startswith("synthetic-vi://"):
        raise SystemExit(
            "IMU_MONOCULAR streams: synthetic-vi://n_frames=N,seed=S "
            "(real capture needs a time-aligned IMU sidecar)"
        )
    from .io.synthetic_vi import SyntheticVIStream

    kwargs = {}
    for kv in url[len("synthetic-vi://"):].split(","):
        if not kv:
            continue
        k, v = kv.split("=")
        kwargs[k] = int(v)
    n_frames = kwargs.pop("n_frames", 300)
    stream = SyntheticVIStream(fps=fps_hint, **kwargs)
    return stream.items(n_frames), n_frames


def open_stereo_stream(url, fps_hint):
    """Stereo stream: yields (left, right) MotionVectorImage pairs (right
    frames skip MV extraction, stereo_video_tartan.cc:74-99)."""
    if url.startswith("synthetic-stereo://"):
        from .io.synthetic_stereo import SyntheticStereoStream

        kwargs = {}
        for kv in url[len("synthetic-stereo://"):].split(","):
            if not kv:
                continue
            k, v = kv.split("=")
            kwargs[k] = int(v)
        n_frames = kwargs.pop("n_frames", 200)
        b = kwargs.pop("baseline_mm", 250) / 1000.0
        stream = SyntheticStereoStream(fps=fps_hint, baseline=b, **kwargs)
        return stream.pairs(n_frames)
    from .io.video import VideoDecoder

    dec = VideoDecoder(url, qlen=12)
    dec.init()

    def pairs():
        while True:
            left = dec.next_image(True)
            if left is None:
                return
            right = dec.next_image(False)
            if right is None:
                return
            yield left, right

    return pairs()


def _finish(slam, n, wall):
    slam.shutdown()
    slam.save_keyframe_trajectory_kitti("TrajectoryKITTIKeyFrame.txt")
    slam.save_trajectory_euroc("TrajectoryEUROC.txt")
    with open("results.txt", "w") as f:
        f.write(
            f"{slam.image_count},{slam.get_total_lost()},"
            f"{slam.mean_track_ms():.6f}\n"
        )
    print(
        f"frames={n} lost={slam.get_total_lost()} "
        f"mean_track_ms={slam.mean_track_ms():.2f} wall_fps={n / wall:.1f}"
    )
    return 0


def mono_main(argv=None):
    argv = list(sys.argv if argv is None else argv)
    if len(argv) < 3:
        print(
            "Usage: mono_video_tartan.py <settings.yaml> <stream> "
            "[--realtime] [--viewer out_dir] [--cpu]"
        )
        return 1
    settings_path, url = argv[1], argv[2]
    realtime = "--realtime" in argv
    use_imu = "--imu" in argv or url.startswith("synthetic-vi://")
    viewer_dir = argv[argv.index("--viewer") + 1] if "--viewer" in argv else None
    _maybe_cpu(argv)
    from .core.system import System

    sensor = System.IMU_MONOCULAR if use_imu else System.MONOCULAR
    slam = System(settings_path, sensor, use_viewer=viewer_dir is not None)
    if viewer_dir:
        slam.viewer.out_dir = viewer_dir
    fps = slam.get_fps()
    if use_imu:
        items, _ = open_vi_stream(url, fps)
    else:
        frames, _ = open_stream(url, fps)
        items = ((smv.timestamp, smv, None) for smv in frames if smv is not None)

    n = 0
    t_start = time.perf_counter()
    if realtime:
        # Real-time pacing (reference mono_video_tartan.cc:73-93): one frame
        # per 1/fps budget, per-frame dispatch.
        for ts, smv, imu in items:
            t0 = time.perf_counter()
            slam.track_monocular(ts, smv, imu=imu)
            n += 1
            budget = 1.0 / fps - (time.perf_counter() - t0)
            if budget > 0:
                time.sleep(budget)
    else:
        # Throughput mode: consume the decoder's lookahead in W-frame
        # windows. flush=False keeps the pipelined drive's windows in
        # flight ACROSS batch calls (the device computes window k+1 while
        # the host replays window k); the final empty flush drains.
        batch = []
        for it in items:
            batch.append(it if use_imu else it[:2])
            if len(batch) >= slam.window:
                slam.track_monocular_batch(batch, flush=False)
                n += len(batch)
                batch = []
        slam.track_monocular_batch(batch, flush=True)
        n += len(batch)
    wall = time.perf_counter() - t_start
    return _finish(slam, n, wall)


def stereo_main(argv=None):
    argv = list(sys.argv if argv is None else argv)
    if len(argv) < 3:
        print(
            "Usage: stereo_video_tartan.py <settings.yaml> <stream> "
            "[--realtime] [--cpu]"
        )
        return 1
    _maybe_cpu(argv)
    from .core.system import System

    slam = System(argv[1], System.STEREO)
    realtime = "--realtime" in argv
    fps = slam.get_fps()
    n = 0
    t_start = time.perf_counter()
    if realtime:
        for left, right in open_stereo_stream(argv[2], fps):
            t0 = time.perf_counter()
            slam.track_stereo(left.timestamp, left, right)
            n += 1
            budget = 1.0 / fps - (time.perf_counter() - t0)
            if budget > 0:
                time.sleep(budget)
    else:
        # Throughput mode: W-frame stereo windows, pipelined across batch
        # calls (depth is computed on device inside the window program).
        batch = []
        for left, right in open_stereo_stream(argv[2], fps):
            batch.append((left.timestamp, left, right))
            if len(batch) >= slam.window:
                slam.track_stereo_batch(batch, flush=False)
                n += len(batch)
                batch = []
        slam.track_stereo_batch(batch, flush=True)
        n += len(batch)
    wall = time.perf_counter() - t_start
    return _finish(slam, n, wall)
