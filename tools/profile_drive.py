"""Profile the windowed mono drive: where does each ms/frame go?

Decomposes the steady-state per-frame cost of the pipelined windowed drive
into: window dispatch (host call overhead), wire pull (D2H sync), host
replay (Tracking state machine), mapper stages (host assembly, device
dispatch, deferred commit pull), and rewind losses.

Usage: python tools/profile_drive.py [n_frames] [window]
"""
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ACC = defaultdict(float)
CNT = defaultdict(int)
EVENTS = []


def timed(obj, name, label):
    orig = getattr(obj, name)

    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = orig(*a, **kw)
        dt = time.perf_counter() - t0
        ACC[label] += dt
        CNT[label] += 1
        EVENTS.append((label, dt))
        return out

    setattr(obj, name, wrap)


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from movslam_tpu.core.system import System
    from movslam_tpu.core.verbose import Verbose
    from movslam_tpu.config.settings import Settings, MONOCULAR
    from movslam_tpu.core.camera import Pinhole
    from movslam_tpu.io.synthetic import SyntheticStream

    Verbose.level = Verbose.QUIET
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = MONOCULAR

    stream = SyntheticStream(n_points=400, seed=42)
    n_warm = 40
    frames = [stream.frame(k) for k in range(n_warm + n_frames)]
    system = System(s, MONOCULAR)
    if len(sys.argv) > 2:
        system.window = int(sys.argv[2])
    W = system.window
    items = [(f.timestamp, f) for f in frames]

    # warm
    k = 0
    while k < n_warm:
        system.track_monocular_batch(items[k : k + W], flush=False)
        k += W
    system.track_monocular_batch([], flush=True)

    # instrument
    system._prof = ACC  # sub-stage accumulator inside dispatch/replay
    timed(system, "_dispatch_window", "win_dispatch")
    timed(system, "_replay_window", "win_replay")
    timed(system.mapper, "process_one", "mapper_total")
    timed(system.mapper, "_commit_deferred", "mapper_commit_pull")
    timed(system.mapper, "_dispatch_mapper_step", "mapper_dispatch")
    timed(system.mapper, "_prepare_triangulation", "mapper_prep_tri")
    timed(system.mapper, "_prepare_local_ba", "mapper_prep_ba")
    timed(system.mapper, "_search_in_neighbors", "mapper_fuse")
    timed(system.mapper, "_process_new_keyframe", "mapper_pnk")
    timed(system.tracking, "track_fused", "replay_track_fused")
    timed(system, "_refresh_snapshot", "snapshot_build")

    # also time the raw wire pull inside replay by wrapping np.asarray? The
    # replay timer includes it; separately time device sync via a probe.
    rewinds = [0]
    orig_replay = system._replay_window

    def replay_probe(wf, wire_np=None):
        t0 = time.perf_counter()
        _ = np.asarray(wf["out"]["wire"])  # the actual D2H sync
        ACC["wire_pull"] += time.perf_counter() - t0
        CNT["wire_pull"] += 1
        out = orig_replay(wf, wire_np)
        if not out[2]:
            rewinds[0] += 1
        return out

    system._replay_window = replay_probe

    t0 = time.perf_counter()
    while k < n_warm + n_frames:
        system.track_monocular_batch(items[k : k + W], flush=False)
        k += W
    system.track_monocular_batch([], flush=True)
    dt = time.perf_counter() - t0

    n = k - n_warm
    print(f"\n=== {n} frames in {dt:.2f}s = {n/dt:.1f} fps "
          f"({1e3*dt/n:.1f} ms/frame), window={W} ===")
    print(f"{'stage':24s} {'total_ms':>9s} {'n':>5s} {'ms/call':>8s} {'ms/frame':>9s}")
    for k_, v in sorted(ACC.items(), key=lambda kv: -kv[1]):
        print(f"{k_:24s} {1e3*v:9.1f} {CNT[k_]:5d} "
              f"{1e3*v/max(CNT[k_],1):8.1f} {1e3*v/n:9.2f}")
    print(f"rewinds: {rewinds[0]}, keyframes: {system.atlas.current.n_keyframes()}, "
          f"lost: {system.get_total_lost()}")
    # window size histogram
    sizes = defaultdict(int)
    for lbl, dt_ in EVENTS:
        pass
    system.shutdown()


if __name__ == "__main__":
    main()
