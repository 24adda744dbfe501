#!/usr/bin/env python
"""Multi-stream evaluation fan-out: N synthetic seeds over a device mesh.

The reference evaluates one stream per process (evaluation/evaluate_movslam.sh);
the TPU-native scale-out for evaluation sweeps is stream-parallelism
(SURVEY.md §2.7): the MV-propagation front end is vmapped over all streams
and sharded one-per-device over the mesh's "data" axis
(parallel/multistream.py), while each stream's full SLAM trajectory is
scored with the standard evaluator. Prints one JSON line per seed
(ate_rmse, ate_pct_of_span, lost, keyframes) plus the sharded front-end
throughput across the fleet.

Usage: multistream_eval.py [n_streams] [n_frames] [--cpu]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv):
    n_streams = int(argv[1]) if len(argv) > 1 else 8
    n_frames = int(argv[2]) if len(argv) > 2 else 120
    if "--cpu" in argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax
    import jax.numpy as jnp

    from movslam_tpu.config.settings import MONOCULAR, Settings
    from movslam_tpu.core.camera import Pinhole
    from movslam_tpu.core.system import System
    from movslam_tpu.core.verbose import Verbose
    from movslam_tpu.io.synthetic import SyntheticStream
    from movslam_tpu.parallel.mesh import make_mesh
    from movslam_tpu.parallel.multistream import make_multistream_propagate
    from evaluation.evaluator import umeyama_alignment

    Verbose.level = Verbose.QUIET
    n_dev = min(len(jax.devices()), n_streams)
    mesh = make_mesh(n_dev)
    streams = [SyntheticStream(n_points=400, seed=100 + s) for s in range(n_streams)]

    # --- sharded batched front end: MV propagation for ALL streams in one
    # dispatch, one stream per device (embarrassingly parallel over ICI).
    prop = make_multistream_propagate(mesh)
    from movslam_tpu.core.trackstate import TrackState

    cap = 512
    frames0 = [st.frame(1) for st in streams[:n_dev]]
    imgs = jnp.asarray(np.stack([f.im_gray for f in frames0]))
    rng = np.random.default_rng(0)
    S = n_dev
    pt = jnp.asarray(rng.uniform(20, 400, (S, cap, 2)).astype(np.float32))
    valid = jnp.asarray(np.tile(np.arange(cap) < cap // 2, (S, 1)))
    coverage = jnp.zeros((S, cap), bool)
    age = jnp.zeros((S, cap), jnp.int32)
    desc = jnp.zeros((S, cap, 8), jnp.uint32)
    wh = jnp.asarray(np.tile([16.0, 16.0], (S, cap, 1)).astype(np.float32))
    mv_delta = jnp.asarray(np.stack([f.mv_delta for f in frames0]))
    mv_rect = jnp.asarray(np.stack([f.mv_rect for f in frames0]))
    mv_dindx = jnp.asarray(np.stack([f.mv_dindx for f in frames0]))
    mv_valid = jnp.asarray(np.stack([f.mv_valid for f in frames0]))
    out = prop(imgs, pt, valid, coverage, age, desc, wh,
               mv_delta, mv_rect, mv_dindx, mv_valid, 25.0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = prop(imgs, pt, valid, coverage, age, desc, wh,
                   mv_delta, mv_rect, mv_dindx, mv_valid, 25.0)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "sharded_frontend": {
            "streams": S, "devices": n_dev,
            "propagate_ms_per_batch": round(1e3 * dt, 2),
            "stream_fps_aggregate": round(S / dt, 1),
        }
    }), flush=True)

    # --- full-trajectory evaluation per seed (host drive; device work is
    # the windowed pipeline; ATE via the standard evaluator).
    for s, stream in enumerate(streams):
        cfg = Settings()
        cfg.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
        cfg.fps = 30.0
        cfg.sensor = MONOCULAR
        system = System(cfg, MONOCULAR)
        items = [(f.timestamp, f) for f in
                 [stream.frame(k) for k in range(n_frames)]]
        t0 = time.perf_counter()
        k = 0
        while k < len(items):
            system.track_monocular_batch(items[k : k + system.window], flush=False)
            k += system.window
        system.track_monocular_batch([], flush=True)
        wall = time.perf_counter() - t0
        est, gt = [], []
        for ts, R, t, lost_f in system.frame_trajectory():
            est.append(-(R.T @ t))
            R_gt, t_gt = stream.gt_pose(round(ts * 30.0))
            gt.append(-(R_gt.T @ t_gt))
        est, gt = np.array(est), np.array(gt)
        ate = float("nan")
        span = float("nan")
        if len(est) > 10:
            sc, Ra, ta = umeyama_alignment(gt, est, with_scale=True)
            resid = gt - (sc * est @ Ra.T + ta)
            ate = float(np.sqrt(np.mean(np.sum(resid**2, axis=1))))
            span = float(np.linalg.norm(np.ptp(gt, axis=0)))
        system.shutdown()
        print(json.dumps({
            "seed": 100 + s,
            "frames": n_frames,
            "fps": round(n_frames / wall, 1),
            "lost": system.get_total_lost(),
            "keyframes": system.atlas.current.n_keyframes(),
            "ate_rmse_m": round(ate, 4),
            "ate_pct_of_span": round(100 * ate / span, 2) if span else None,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
