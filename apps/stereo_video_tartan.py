#!/usr/bin/env python
"""Stereo MOV-SLAM CLI.

Mirrors /root/reference/Examples/Stereo/stereo_video_tartan.cc: the stream is
frame-packed (interlaced L/R; right frames skip MV extraction,
stereo_video_tartan.cc:74-99). Args: `<settings.yaml> <stream>`.

`synthetic-stereo://n_frames=N,seed=S[,baseline_mm=B]` uses the fake decoder
with a rendered right view at the given baseline.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def open_stereo_stream(url, fps_hint):
    if url.startswith("synthetic-stereo://"):
        from movslam_tpu.io.synthetic_stereo import SyntheticStereoStream

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
    from movslam_tpu.io.video import VideoDecoder

    dec = VideoDecoder(url, qlen=12)
    dec.init()

    def pairs():
        while True:
            left = dec.next_image(True)
            if left is None:
                return
            right = dec.next_image(False)  # right frame skips MV extraction
            if right is None:
                return
            yield left, right

    return pairs()


def main(argv):
    if len(argv) < 3:
        print("Usage: stereo_video_tartan.py <settings.yaml> <stream> [--realtime]")
        return 1
    if "--cpu" in argv:
        # Local verification: force the CPU backend + persistent compile
        # cache (the image's sitecustomize pins the tunneled TPU platform;
        # the config API wins when applied before first jax use).
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from movslam_tpu.core.system import System

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
        # Throughput mode: W-frame stereo windows (one dispatch per window;
        # depth is computed on device inside the same program).
        batch = []
        for left, right in open_stereo_stream(argv[2], fps):
            batch.append((left.timestamp, left, right))
            if len(batch) >= slam.window:
                slam.track_stereo_batch(batch)
                n += len(batch)
                batch = []
        if batch:
            slam.track_stereo_batch(batch)
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
