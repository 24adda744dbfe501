"""Diagnose the stereo early-map gauge excursion (seeds 7/23).

Runs the windowed stereo drive and prints, per frame: camera-center error
vs GT, current KF count, and per-keyframe pose error at creation time vs
after the run (did local BA repair it?).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from movslam_tpu.config.settings import STEREO, Settings
from movslam_tpu.core.camera import Pinhole
from movslam_tpu.core.system import System
from movslam_tpu.core.verbose import Verbose
from movslam_tpu.io.synthetic_stereo import SyntheticStereoStream

Verbose.level = Verbose.QUIET


def _settings():
    s = Settings()
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, 640, 480)
    s.fps = 30.0
    s.sensor = STEREO
    s.b = 0.25
    s.bf = 0.25 * 320.0
    s.th_depth = 50.0
    return s


def run(seed, n=30):
    stream = SyntheticStereoStream(seed=seed)
    items = [(l.timestamp, l, r) for l, r in stream.pairs(n)]
    sys_s = System(_settings(), STEREO)
    k = 0
    while k < len(items):
        sys_s.track_stereo_batch(items[k : k + 8])
        k += 8
    sys_s.shutdown()
    errs = []
    for k, (R_rel, t_rel) in enumerate(sys_s.tracking.rel_poses):
        ref = sys_s.tracking.rel_refs[k]
        R = R_rel @ ref.R
        t = R_rel @ ref.t + t_rel
        C = -(R.T @ t)
        R_gt, t_gt = stream.gt_pose(k + 1)
        C_gt = -(R_gt.T @ t_gt)
        errs.append(np.linalg.norm(C - C_gt))
    errs = np.array(errs)
    print(f"seed {seed}: median {np.median(errs):.3f} max {errs.max():.3f}")
    print("  per-frame err:", np.array2string(errs, precision=2, max_line_width=120))
    # Final KF poses vs GT (KF fid -> error): did BA repair the early KFs?
    m = sys_s.atlas.current
    for kf in sorted(m.keyframes.values(), key=lambda k: k.id):
        C = -(kf.R.T @ kf.t)
        R_gt, t_gt = stream.gt_pose(kf.frame_id)
        C_gt = -(R_gt.T @ t_gt)
        print(f"  KF id={kf.id} fid={kf.frame_id} final_err={np.linalg.norm(C - C_gt):.3f}")
    return errs


if __name__ == "__main__":
    seeds = [int(a) for a in sys.argv[1:]] or [7, 23, 1]
    for s in seeds:
        run(s)
