"""Probe: decompose the window program's device time.

Times tracked_window_step at W with and without the fused mapper section
(mtri=None drops mapper_body from the graph), isolating the per-window fixed
cost of the in-program mapper vs the scan body.

Usage: python tools/probe_window_decomp.py [W ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    Ws = [int(a) for a in sys.argv[1:]] or [8]
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/movslam_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from movslam_tpu.io.synthetic import SyntheticStream
    from movslam_tpu.core.trackstate import TrackState
    from movslam_tpu.ops.window_step import tracked_window_step

    stream = SyntheticStream(n_points=400, seed=42)
    frames = [stream.frame(k) for k in range(1 + max(Ws))]

    rng = np.random.default_rng(0)
    cap = 1024
    st = TrackState.empty(cap)
    n = cap // 2
    st = st.replace(
        pt=jnp.asarray(rng.uniform(16, 460, (cap, 2)).astype(np.float32)),
        track_id=jnp.asarray(np.arange(cap, dtype=np.int32)),
        valid=jnp.asarray(np.arange(cap) < n),
        age=jnp.asarray(rng.integers(0, 5, cap).astype(np.int32)),
        next_id=jnp.asarray(cap, jnp.int32),
    )
    P = 4096
    snap = np.zeros((P, 12), np.float32)
    snap[:, 0:3] = rng.normal(0, 2, (P, 3))
    snap[:, 2] += 10
    snap[:, 5] = 1.0
    snap[:, 7] = 100.0
    snap[:, 8] = 1.0
    snap[:, 9] = 1.0
    snap[:, 10] = (
        np.sort(rng.choice(100000, P, replace=False)).astype(np.int32)
    ).view(np.float32)
    snap[:, 11] = np.arange(P)
    snap = jnp.asarray(snap)
    intr = jnp.asarray([320.0, 320.0, 320.0, 240.0], jnp.float32)
    dist = jnp.zeros(10, jnp.float32)
    key = jax.random.PRNGKey(0)
    prev_img = jnp.asarray(frames[0].im_gray)

    from movslam_tpu.ops.mapper_step import BA_MOPP, MAPPER_SMALL, C_PATCH, P_PATCH
    from movslam_tpu.ops.frame_step import SNAP_CAP

    for W in Ws:
        mvks = []
        n_mvs = None
        for f in frames[1 : W + 1]:
            mvk, m = f.packed_joint_i16()
            mvks.append(mvk)
            n_mvs = m
        mvk_stack = jnp.asarray(np.stack(mvks))
        imgs = jnp.asarray(np.stack([f.im_gray for f in frames[1 : W + 1]]))
        pose_pack = jnp.zeros(25, jnp.float32)
        sz = MAPPER_SMALL
        mtri = jnp.zeros((sz["C"] + 1, 32), jnp.float32)
        mba = jnp.zeros(
            sz["K"] * 14 + sz["P"] * 4 + sz["O"] * 6 + sz["P"] * BA_MOPP,
            jnp.float32,
        )
        meta = np.full(P_PATCH + 1, SNAP_CAP, np.float32)
        meta[0] = 0.0
        patch = (
            jnp.zeros((C_PATCH, 10), jnp.float32),
            jnp.zeros((P_PATCH, 3), jnp.float32),
            jnp.asarray(meta),
        )

        def run(with_mapper):
            return tracked_window_step(
                imgs, prev_img, st, mvk_stack, pose_pack, snap, intr, key,
                dist, patch_tri=patch[0], patch_mp=patch[1],
                patch_meta=patch[2],
                mtri=mtri if with_mapper else None,
                mba=mba if with_mapper else None,
                n_mvs=n_mvs, reproj_err=5.0, threshold=25.0,
                coverage_threshold=0.2, capacity=cap, max_cov=512,
            )

        for with_mapper in (True, False):
            out = run(with_mapper)
            _ = np.asarray(out["wire"][:1])  # compile + warm
            reps = 8
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run(with_mapper)
                _ = np.asarray(out["wire"][:1])
            dt = (time.perf_counter() - t0) / reps
            print(
                f"W={W:3d} mapper={int(with_mapper)}: "
                f"{1e3*dt:7.1f} ms ({1e3*dt/W:6.2f} ms/f)", flush=True,
            )


if __name__ == "__main__":
    main()
