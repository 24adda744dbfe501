"""Parallel compile prewarm: populate the XLA compile cache before a drive.

Remote-TPU compilation of the big pipeline programs (the W-frame window
program, the fused per-frame program, the mapper size classes) takes minutes
each through the tunnel on a cold cache — serially that sinks any
first-run/benchmark budget (round-4 bench: rc=124, no number recorded).
The backend compiles CONCURRENTLY from multiple host threads (measured:
wall time = max of the individual compiles, not the sum), so this module
traces every program a windowed mono drive dispatches, in parallel worker
threads, against dummy inputs with the exact production shapes. Results are
discarded — the value is the populated in-process jit cache + the
persistent compile cache (jax_compilation_cache_dir).

The reference has no equivalent stage: its cost model is C++ compile time,
paid at build time. This is the TPU build's analogue, paid once per
(code version, shape set) and amortized by the persistent cache.
"""
from __future__ import annotations

import threading

import numpy as np


def _dummy_window_args(W, capacity, H, Wd, snap_cap, n_mvs, n_kps):
    import jax
    import jax.numpy as jnp

    from ..core.trackstate import TrackState
    from ..ops.frame_step import SNAP_CAP
    from ..ops.mapper_step import BA_MOPP, C_PATCH, MAPPER_SMALL, P_PATCH

    rng = np.random.default_rng(0)
    st = TrackState.empty(capacity)
    st = st.replace(
        pt=jnp.asarray(rng.uniform(16, min(H, Wd) - 20, (capacity, 2)).astype(np.float32)),
        track_id=jnp.asarray(np.arange(capacity, dtype=np.int32)),
        valid=jnp.asarray(np.arange(capacity) < capacity // 2),
        age=jnp.asarray(rng.integers(0, 5, capacity).astype(np.int32)),
        next_id=jnp.asarray(capacity, jnp.int32),
    )
    snap = np.zeros((snap_cap, 12), np.float32)
    snap[:, 0:3] = rng.normal(0, 2, (snap_cap, 3))
    snap[:, 2] += 10
    snap[:, 5] = 1.0
    snap[:, 7] = 100.0
    snap[:, 8] = 1.0
    snap[:, 9] = 1.0
    snap[:, 10] = (
        np.sort(rng.choice(100000, snap_cap, replace=False)).astype(np.int32)
    ).view(np.float32)
    imgs = jnp.asarray(rng.integers(0, 255, (W, H, Wd)).astype(np.uint8))
    prev_img = jnp.asarray(rng.integers(0, 255, (H, Wd)).astype(np.uint8))
    mvk = jnp.asarray(
        rng.integers(-64, 64, (W, n_mvs + n_kps + 1, 8)).astype(np.int16)
    )
    sz = MAPPER_SMALL
    mtri = jnp.zeros((sz["C"] + 1, 32), jnp.float32)
    mba = jnp.zeros(
        sz["K"] * 14 + sz["P"] * 4 + sz["O"] * 6 + sz["P"] * BA_MOPP,
        jnp.float32,
    )
    meta = np.full(P_PATCH + 1, SNAP_CAP, np.float32)
    meta[0] = 0.0
    return {
        "imgs": imgs,
        "prev_img": prev_img,
        "state": st,
        "mvk": mvk,
        "pose_pack": jnp.zeros(25, jnp.float32),
        "snap": jnp.asarray(snap),
        "intr": jnp.asarray([320.0, 320.0, 320.0, 240.0], jnp.float32),
        "key": jax.random.PRNGKey(0),
        "dist": jnp.zeros(10, jnp.float32),
        "patch_tri": jnp.zeros((C_PATCH, 10), jnp.float32),
        "patch_mp": jnp.zeros((P_PATCH, 3), jnp.float32),
        "patch_meta": jnp.asarray(meta),
        "mtri": mtri,
        "mba": mba,
    }


def prewarm_windowed_mono(
    window_sizes,
    *,
    capacity=1024,
    height=480,
    width=640,
    n_mvs=4096,
    n_kps=2048,
    reproj_err=5.0,
    threshold=25.0,
    coverage_threshold=0.2,
    has_dist=False,
    include_mapper=True,
    include_frame_step=True,
    verbose=False,
):
    """Compile the windowed mono drive's device programs in parallel.

    window_sizes: the window-length buckets the drive will dispatch
    (System._collect_run's power-of-two buckets up to System.window).
    n_mvs/n_kps must match the stream's packed_joint_i16 capacities
    (io/mvimage.py MAX_MVS/MAX_KPS). Blocks until every program is
    compiled; safe to call while another thread uses the same device.
    """
    from ..ops.frame_step import tracked_frame_step
    from ..ops.mapper_step import (
        BA_MOPP, MAPPER_BIG, MAPPER_SMALL, mapper_step_wire,
    )
    from ..ops.window_step import tracked_window_step

    import jax.numpy as jnp

    errs = []

    def _log(msg):
        if verbose:
            import sys
            import time

            print(f"[prewarm {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr)

    def compile_window(W):
        a = _dummy_window_args(
            W, capacity, height, width, 4096, n_mvs, n_kps
        )
        out = tracked_window_step(
            a["imgs"], a["prev_img"], a["state"], a["mvk"], a["pose_pack"],
            a["snap"], a["intr"], a["key"], a["dist"],
            patch_tri=a["patch_tri"], patch_mp=a["patch_mp"],
            patch_meta=a["patch_meta"], mtri=a["mtri"], mba=a["mba"],
            n_mvs=n_mvs, reproj_err=reproj_err, threshold=threshold,
            coverage_threshold=coverage_threshold, capacity=capacity,
            max_cov=512, has_dist=has_dist,
        )
        np.asarray(out["wire"][:1])
        _log(f"window W={W} ready")

    def compile_frame_step():
        a = _dummy_window_args(
            1, capacity, height, width, 4096, n_mvs, n_kps
        )
        mvk_f32 = a["mvk"][0].astype(jnp.float32)
        trailer = jnp.zeros((2, 8), jnp.float32)
        out = tracked_frame_step(
            a["imgs"][0], a["prev_img"], a["state"],
            jnp.concatenate([mvk_f32[:-1], trailer]), None, a["snap"],
            a["intr"], a["key"], a["dist"],
            n_mvs=n_mvs, reproj_err=reproj_err, threshold=threshold,
            coverage_threshold=coverage_threshold, capacity=capacity,
            max_cov=512, has_dist=has_dist,
        )
        np.asarray(out["wire"][:1])
        _log("frame_step ready")

    def compile_mapper(size):
        intr = jnp.asarray([320.0, 320.0, 320.0, 240.0], jnp.float32)
        tri = jnp.zeros((size["C"] + 1, 32), jnp.float32)
        ba = jnp.zeros(
            size["K"] * 14 + size["P"] * 4 + size["O"] * 6
            + size["P"] * BA_MOPP,
            jnp.float32,
        )
        out = mapper_step_wire(
            tri, ba, intr, 0.0,
            C=size["C"], K=size["K"], P=size["P"], O=size["O"],
        )
        np.asarray(out["wire"][:1])
        _log(f"mapper K={size['K']} ready")

    jobs = [lambda W=W: compile_window(W) for W in window_sizes]
    if include_frame_step:
        jobs.append(compile_frame_step)
    if include_mapper:
        jobs.append(lambda: compile_mapper(MAPPER_SMALL))
        jobs.append(lambda: compile_mapper(MAPPER_BIG))

    def _run(fn):
        try:
            fn()
        except Exception as e:  # pragma: no cover - diagnostic path
            errs.append(e)

    threads = [threading.Thread(target=_run, args=(j,)) for j in jobs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
