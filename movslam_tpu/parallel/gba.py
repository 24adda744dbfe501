"""Multi-chip global bundle adjustment: the PRODUCT path over parallel/sharded_ba.

Wires the mesh-sharded Schur BA kernel (parallel/sharded_ba.py) into the
same assemble/commit machinery the single-chip global BA uses
(core/local_mapping.py::global_bundle_adjustment, mirroring
Optimizer::BundleAdjustment, /root/reference/src/Optimizer.cc:61-395):
System.global_bundle_adjustment(mesh=...) lands here. Map points and their
observations are partitioned point-contiguously across the mesh's "data"
axis; each device linearizes its shard and the reduced camera system is
psum'd over ICI; poses/points write back through the standard pruning
commit. Visual (mono) observations only — the pose gauge and LM schedule
match ops/ba.py, so sharded and single-chip runs agree to solver tolerance
(tests/test_parallel.py, tests/test_gba_sharded.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.local_mapping import (
    GBA_KF_BUCKETS,
    GBA_MAX_MP,
    GBA_MAX_OBS,
    _bucket,
    assemble_ba_problem,
    commit_ba_result,
)
from ..ops.ba import build_obs_by_point
from .sharded_ba import make_sharded_ba

_STEP_CACHE = {}


def _shard_problem(prob, D, mopp):
    """Partition an assembled BA problem point-contiguously over D shards.

    Points: P split into D equal chunks (P is a power-of-two bucket).
    Observations: the assembly emits them point-major-sorted, so each
    shard's rows are a contiguous slice; every shard is padded to one
    uniform capacity and obs_mp is re-indexed into the LOCAL point chunk.
    Returns arrays whose leading dims are D*chunk (sharded over the mesh)
    plus the observation selector for writeback."""
    kf_pack = prob["kf_pack"]
    mp_pack = prob["mp_pack"]
    obs_pack = prob["obs_pack"]
    P = mp_pack.shape[0]
    assert P % D == 0, (P, D)
    Pd = P // D

    obs_mp = obs_pack[:, 1].astype(np.int64)
    obs_valid = obs_pack[:, 5] > 0
    shard_of = np.where(obs_valid, obs_mp // Pd, -1)
    counts = np.array([(shard_of == d).sum() for d in range(D)])
    Od = 1 << int(np.maximum(counts.max(), 1) - 1).bit_length()
    Od = min(Od, obs_pack.shape[0])

    obs_sh = np.zeros((D, Od, 6), np.float32)
    obp_sh = np.zeros((D, Pd, mopp), np.int64)
    for d in range(D):
        rows = np.flatnonzero(shard_of == d)[:Od]
        n = len(rows)
        obs_sh[d, :n] = obs_pack[rows]
        obs_sh[d, :n, 1] -= d * Pd  # localize point index
        local_mp = np.where(
            obs_sh[d, :, 5] > 0, obs_sh[d, :, 1].astype(np.int64), Pd
        )
        obp_sh[d] = build_obs_by_point(local_mp, Pd, mopp, Od)

    return {
        "kf_pack": kf_pack,
        "mp_pos": mp_pack[:, 0:3],
        "mp_valid": mp_pack[:, 3] > 0,
        "obs_kf": obs_sh[:, :, 0].reshape(-1).astype(np.int32),
        "obs_mp": obs_sh[:, :, 1].reshape(-1).astype(np.int32),
        "obs_uv": obs_sh[:, :, 2:4].reshape(-1, 2),
        "obs_valid": obs_sh[:, :, 5].reshape(-1) > 0,
        "obp": obp_sh.reshape(-1, mopp),
        "Od": Od,
    }


def _host_chi2_depth(kfs, obs_meta, R, t, X, camera, n_obs):
    """Per-observation chi2/depth AFTER the solve, for the standard pruning
    commit (Optimizer.cc:761-818 semantics; matches ops/ba out_obs)."""
    o_kf, o_mp, o_slot = obs_meta
    n = len(o_kf)
    out = np.zeros((n_obs, 2), np.float32)
    if n == 0:
        return out
    Rk = R[o_kf]
    tk = t[o_kf]
    Xo = X[o_mp]
    pc = np.einsum("oij,oj->oi", Rk, Xo) + tk
    z = pc[:, 2]
    u = camera.fx * pc[:, 0] / np.maximum(z, 1e-9) + camera.cx
    v = camera.fy * pc[:, 1] / np.maximum(z, 1e-9) + camera.cy
    uv = np.stack(
        [kfs[int(o_kf[i])].pts[int(o_slot[i])] for i in range(n)]
    )
    r2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    out[:n, 0] = r2
    out[:n, 1] = z
    return out


def global_bundle_adjustment_sharded(
    m, camera, mesh, bf=0.0, iters=20, map_lock=None
):
    """Full-map BA over a device mesh (System.global_bundle_adjustment's
    mesh= path). Same window/anchor structure as the single-chip GBA."""
    kfs = sorted(
        (kf for kf in m.keyframes.values() if not kf.bad), key=lambda k: k.id
    )
    if not kfs:
        return
    max_kf = GBA_KF_BUCKETS[-1]
    if len(kfs) <= max_kf:
        windows = [(kfs, 0)]
    else:
        overlap = min(64, max_kf // 2)
        step = max_kf - overlap
        windows = [(kfs[:max_kf], 0)]
        i = step
        while i + overlap < len(kfs):
            windows.append((kfs[i : i + max_kf], overlap))
            i += step

    for w_kfs, n_anchor in windows:
        _sharded_window(m, camera, mesh, w_kfs, n_anchor, iters, map_lock)


def _sharded_window(m, camera, mesh, kfs, n_anchor, iters, map_lock):
    D = mesh.devices.size
    K = _bucket(len(kfs), GBA_KF_BUCKETS[0], GBA_KF_BUCKETS[-1])
    kf_ids = {kf.id for kf in kfs}
    mps = []
    seen = set()
    for kf in kfs:
        for mid in kf.mp_ids:
            if mid >= 0 and mid not in seen:
                seen.add(int(mid))
                mp = m.mappoints.get(int(mid))
                if mp is not None and not mp.bad:
                    mps.append(mp)
    mps = mps[:GBA_MAX_MP]

    anchor_id = m.init_kf_id if m.init_kf_id in kf_ids else kfs[0].id
    ordered = [kf for kf in kfs[n_anchor:]] + [kf for kf in kfs[:n_anchor]]
    prob = assemble_ba_problem(
        ordered, len(ordered) - n_anchor, mps, anchor_id, K,
        p_lo=max(512, D), p_hi=GBA_MAX_MP, o_lo=2048, o_hi=GBA_MAX_OBS,
    )
    if prob is None:
        return
    mopp = prob["obp"].shape[1]
    sh = _shard_problem(prob, D, mopp)

    key = (id(mesh), iters)
    step = _STEP_CACHE.get(key)
    if step is None:
        step = make_sharded_ba(mesh, iters=iters)
        _STEP_CACHE[key] = step

    kf_pack = sh["kf_pack"]
    R_sh, t_sh, X_sh, _ = step(
        jnp.asarray(kf_pack[:, 0:9].reshape(-1, 3, 3)),
        jnp.asarray(kf_pack[:, 9:12]),
        jnp.asarray(kf_pack[:, 12] > 0),
        jnp.asarray(kf_pack[:, 13] > 0),
        jnp.asarray(sh["mp_pos"]),
        jnp.asarray(sh["mp_valid"]),
        jnp.asarray(sh["obs_kf"]),
        jnp.asarray(sh["obs_mp"]),
        jnp.asarray(sh["obs_uv"]),
        jnp.asarray(sh["obs_valid"]),
        jnp.asarray(sh["obp"].astype(np.int32)),
        camera.fx, camera.fy, camera.cx, camera.cy,
    )
    R = np.asarray(R_sh, np.float64)
    t = np.asarray(t_sh, np.float64)
    X = np.asarray(X_sh, np.float64)

    out_kf = np.zeros((K, 12), np.float32)
    out_kf[:, 0:9] = R.reshape(K, 9)
    out_kf[:, 9:12] = t
    out_obs = _host_chi2_depth(
        ordered, prob["obs_meta"], R, t, X, camera,
        prob["obs_pack"].shape[0],
    )
    res = (out_kf, X[: prob["mp_pack"].shape[0]].astype(np.float32), out_obs)
    if map_lock is not None:
        map_lock.acquire()
    try:
        commit_ba_result(
            res, prob["obs_meta"], ordered, prob["mps"], prob["kf_fixed"], m
        )
    finally:
        if map_lock is not None:
            map_lock.release()
