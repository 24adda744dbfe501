#!/usr/bin/env python
"""Monocular MOV-SLAM CLI.

Mirrors the reference binary
(/root/reference/Examples/Monocular/mono_video_tartan.cc): args are
`<settings.yaml> <stream>`; the loop decodes MV frames, tracks each one, and
on shutdown writes TrajectoryKITTIKeyFrame.txt, TrajectoryEUROC.txt and
results.txt = `imageCnt,totalLost,avg_ms`.

`<stream>` forms:
  synthetic://n_frames=N,seed=S[,n_points=P]   ground-truth fake decoder
  <path.mp4 | mpegts | tcp://host:port>        native FFmpeg decoder (if built)
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def open_stream(url, fps_hint=30.0):
    if url.startswith("synthetic://"):
        from movslam_tpu.io.synthetic import SyntheticStream

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
    from movslam_tpu.io.video import VideoDecoder

    dec = VideoDecoder(url, qlen=12)
    dec.init()
    return iter(dec), None


def main(argv):
    if len(argv) < 3:
        print("Usage: mono_video_tartan.py <settings.yaml> <stream> [--realtime] [--viewer out_dir]")
        return 1
    settings_path, url = argv[1], argv[2]
    realtime = "--realtime" in argv
    viewer_dir = None
    if "--viewer" in argv:
        viewer_dir = argv[argv.index("--viewer") + 1]

    if "--cpu" in argv:
        # Local verification: force the CPU backend + persistent compile
        # cache (the image's sitecustomize pins the tunneled TPU platform;
        # the config API wins when applied before first jax use).
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from movslam_tpu.core.system import System

    slam = System(settings_path, System.MONOCULAR, use_viewer=viewer_dir is not None)
    if viewer_dir:
        slam.viewer.out_dir = viewer_dir
    fps = slam.get_fps()
    frames, _ = open_stream(url, fps)

    n = 0
    t_start = time.perf_counter()
    if realtime:
        # Real-time pacing (reference mono_video_tartan.cc:73-93): one frame
        # per 1/fps budget, per-frame dispatch.
        for smv in frames:
            if smv is None:
                break
            t0 = time.perf_counter()
            slam.track_monocular(smv.timestamp, smv)
            n += 1
            budget = 1.0 / fps - (time.perf_counter() - t0)
            if budget > 0:
                time.sleep(budget)
    else:
        # Throughput mode: consume the decoder's lookahead in W-frame
        # windows (one device dispatch per window, ops/window_step).
        batch = []
        for smv in frames:
            if smv is None:
                break
            batch.append((smv.timestamp, smv))
            if len(batch) >= slam.window:
                slam.track_monocular_batch(batch)
                n += len(batch)
                batch = []
        if batch:
            slam.track_monocular_batch(batch)
            n += len(batch)
    wall = time.perf_counter() - t_start

    slam.shutdown()
    slam.save_keyframe_trajectory_kitti("TrajectoryKITTIKeyFrame.txt")
    slam.save_trajectory_euroc("TrajectoryEUROC.txt")
    with open("results.txt", "w") as f:
        f.write(f"{slam.image_count},{slam.get_total_lost()},{slam.mean_track_ms():.6f}\n")
    print(
        f"frames={n} lost={slam.get_total_lost()} "
        f"mean_track_ms={slam.mean_track_ms():.2f} wall_fps={n / wall:.1f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
