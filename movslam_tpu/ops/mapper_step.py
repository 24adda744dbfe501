"""Fused per-keyframe mapper program: triangulation + local BA in ONE dispatch.

The reference's mapper thread runs CreateNewMapPoints (per-pair
cv::triangulatePoints, /root/reference/src/LocalMapping.cc:220-501) and then
LocalBundleAdjustment (g2o, Optimizer.cc:461-841) as separate synchronous
stages. Through a remote TPU every dispatch costs ~30 ms and every pull ~40 ms
of fixed RTT, so the TPU build fuses both stages into one jitted program with
a single flat result wire:

    inputs : tri_wire  (C+1, 32) — row 0 = [P1 flat(12) | R1(9) | t1(3) |
             th_far(1)]; rows 1.. = [P2 flat(12) | uv1(2) | uv2(2) | R2(9) |
             t2(3) | tid i32-bits(1) | valid(1)] per candidate pair
             ba_wire   flat f32 — the ops.ba.ba_solve_wire layout
    outputs: wire      flat f32 [X C*3 | out_kf K*12 | out_mp P*3 | out_obs O*2]
             patch_tri (C_PATCH, 10) [X(3) | tid bits | ok | normal(3) |
             mind | maxd] — device-gated new points (CreateNewMapPoints
             gates, LocalMapping.cc:311-495 evaluated in-program)
             patch_mp  (P_PATCH, 3) — BA-optimized point positions

All shapes are PINNED (two compiled variants, ever): the host pads candidate
pairs to C and the BA problem to (K, P, O). The patch outputs are pinned to
ONE shape across both size classes so the window program
(ops/window_step) can take them as inputs regardless of which class ran.

The driving LocalMapping dispatches this at keyframe n; the WINDOW program
tracking the next frames takes patch_tri/patch_mp as device-resident inputs
and scatters them into its map snapshot (no host round trip), while the flat
wire is pulled and committed into the host graph at keyframe n+1 — the
TPU-native equivalent of the reference's mapper thread overlapping its
tracking thread (System.cc:129), minus every blocking host<->device sync.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ba import ba_solve_packed
from .triangulate import triangulate_pairs

# Pinned capacities (two XLA programs, ever). See MapperJob in core/local_mapping.
TRI_CAP = 4096
BA_K = 48
BA_P = 2048
BA_O = 8192
BA_MOPP = 16

# Pinned patch shapes (shared by SMALL and BIG so the window program has ONE
# input signature): the first C_PATCH gated triangulations and all BA point
# positions ride to the next window's snapshot patch.
C_PATCH = 1024
P_PATCH = 2048

# Two fixed size classes: SMALL covers the common live local-BA problem
# (<=32 KFs, <=1024 points, <=4096 obs, <=1024 tri pairs) at ~half the BIG
# variant's device time — the fused mapper program sits on the device-serial
# critical path (window program + mapper program per keyframe cycle), so its
# compute directly bounds end-to-end fps. BIG is the cap. Exactly these two
# variants compile; the dispatcher picks per keyframe.
MAPPER_SMALL = {"C": 1024, "K": 32, "P": 1024, "O": 4096}
MAPPER_BIG = {"C": TRI_CAP, "K": BA_K, "P": BA_P, "O": BA_O}

REPROJ_TRI = 5.0  # CreateNewMapPoints reprojection gate (LocalMapping.cc:420)
COS_PARALLAX = 0.9998  # ray parallax gate (~1.15 deg)
# MapPoint scale-invariance band parameters — MUST match core/map.py
# (SCALE_FACTOR, N_LEVELS); duplicated here because ops/ never imports core/.
SCALE_FACTOR = 1.2
N_LEVELS = 8


def _tri_gates(X, row0, P2s, uv1, uv2, R2s, t2s, cand_valid, intr):
    """CreateNewMapPoints acceptance gates evaluated on device (mirrors the
    host's _commit_triangulation numpy gates, core/local_mapping.py): finite,
    parallax, positive depths, reprojection <= delta, positive/far distances.
    Returns (ok (C,), normal (C,3), mind (C,), maxd (C,)) matching what the
    host commit's update_normals_batch (core/map.py) would assign to the new
    2-observation point: normal = mean of the two unit viewing dirs, distance
    band from the first keyframe's distance. The host commit stays canonical
    — this gate only decides which rows patch the NEXT window's transient
    snapshot, so near-boundary disagreement with the host is harmless."""
    P1 = row0[0:12].reshape(3, 4)
    R1 = row0[12:21].reshape(3, 3)
    t1 = row0[21:24]
    th_far = row0[24]
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]

    Ow1 = -R1.T @ t1
    Ow2 = -jnp.einsum("cji,cj->ci", R2s, t2s)

    # Parallax between viewing rays (world frame).
    r1c = jnp.stack(
        [(uv1[:, 0] - cx) / fx, (uv1[:, 1] - cy) / fy, jnp.ones_like(uv1[:, 0])],
        axis=1,
    )
    r2c = jnp.stack(
        [(uv2[:, 0] - cx) / fx, (uv2[:, 1] - cy) / fy, jnp.ones_like(uv2[:, 0])],
        axis=1,
    )
    ray1 = r1c @ R1  # R1^T r, row-wise
    ray2 = jnp.einsum("cji,cj->ci", R2s, r2c)
    cos_par = jnp.einsum("ci,ci->c", ray1, ray2) / (
        jnp.linalg.norm(ray1, axis=1) * jnp.linalg.norm(ray2, axis=1) + 1e-12
    )

    Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=1)  # (C, 4)
    p1 = Xh @ P1.T  # (C, 3); z1 = p1[:,2] since K's last row is [0 0 1]
    p2 = jnp.einsum("cij,cj->ci", P2s, Xh)
    z1 = p1[:, 2]
    z2 = p2[:, 2]
    u1 = p1[:, 0] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
    v1 = p1[:, 1] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
    u2 = p2[:, 0] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
    v2 = p2[:, 1] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
    e1 = (u1 - uv1[:, 0]) ** 2 + (v1 - uv1[:, 1]) ** 2
    e2 = (u2 - uv2[:, 0]) ** 2 + (v2 - uv2[:, 1]) ** 2

    d1 = jnp.linalg.norm(X - Ow1, axis=1)
    d2 = jnp.linalg.norm(X - Ow2, axis=1)
    ok = (
        cand_valid
        & jnp.isfinite(X).all(axis=1)
        & (cos_par < COS_PARALLAX)
        & (z1 > 0) & (z2 > 0)
        & (e1 <= REPROJ_TRI) & (e2 <= REPROJ_TRI)
        & (d1 > 0) & (d2 > 0)
    )
    ok = ok & jnp.where(th_far > 0, (d1 < th_far) & (d2 < th_far), True)
    # Host parity (update_normals_batch): normal = MEAN of the unit viewing
    # directions (un-normalized mean, matching acc/cnt), band from d1 (the
    # first/creating keyframe is the reference observation).
    u1dir = (X - Ow1) / jnp.maximum(d1, 1e-9)[:, None]
    u2dir = (X - Ow2) / jnp.maximum(d2, 1e-9)[:, None]
    normal = 0.5 * (u1dir + u2dir)
    maxd = d1 * SCALE_FACTOR
    mind = maxd / (SCALE_FACTOR ** N_LEVELS)
    return ok, normal, mind, maxd


@functools.partial(
    jax.jit, static_argnames=("C", "K", "P", "O", "MOPP", "iters")
)
def mapper_step_wire(
    tri_wire, ba_wire, intr, bf, *, C=TRI_CAP, K=BA_K, P=BA_P, O=BA_O,
    MOPP=BA_MOPP, iters=10,
):
    """One keyframe's device work: C-pair DLT triangulation + (K,P,O) LM BA.

    Returns dict(wire, patch_tri, patch_mp) — see module docstring. Padded
    rows are harmless: zero tri rows triangulate to garbage that fails the
    device gates and that the host gates away; zero-validity BA rows
    contribute nothing and fixed/invalid keyframes come back unchanged.
    """
    return mapper_body(
        tri_wire, ba_wire, intr, bf, K=K, P=P, O=O, MOPP=MOPP, iters=iters
    )


def mapper_body(
    tri_wire, ba_wire, intr, bf, *, K=BA_K, P=BA_P, O=BA_O,
    MOPP=BA_MOPP, iters=10,
):
    """Traceable mapper computation (triangulation + LM BA + patch bundles).

    Shared by the standalone per-keyframe program above and by the windowed
    drive, which inlines one keyframe's mapper work into the next window's
    dispatch (ops/window_step) so the tri/BA wires ride the window's upload
    and the result rides the window's result wire — zero extra transfers on
    the serial tunnel link."""
    row0 = tri_wire[0]
    P1 = row0[0:12].reshape(3, 4)
    P2s = tri_wire[1:, 0:12].reshape(-1, 3, 4)
    uv1 = tri_wire[1:, 12:14]
    uv2 = tri_wire[1:, 14:16]
    R2s = tri_wire[1:, 16:25].reshape(-1, 3, 3)
    t2s = tri_wire[1:, 25:28]
    tid_bits = tri_wire[1:, 28]
    cand_valid = tri_wire[1:, 29] > 0
    X = triangulate_pairs(P1, P2s, uv1, uv2)  # (C, 3)
    ok, normal, mind, maxd = _tri_gates(
        X, row0, P2s, uv1, uv2, R2s, t2s, cand_valid, intr
    )

    o0 = K * 14
    o1 = o0 + P * 4
    o2 = o1 + O * 6
    kf_pack = ba_wire[:o0].reshape(K, 14)
    mp_pack = ba_wire[o0:o1].reshape(P, 4)
    obs_pack = ba_wire[o1:o2].reshape(O, 6)
    obp = ba_wire[o2:].reshape(P, MOPP).astype(jnp.int32)
    out_kf, out_mp, out_obs = ba_solve_packed(
        kf_pack, mp_pack, obs_pack, obp, intr, bf, iters=iters
    )

    # Pinned-shape patch bundle for the next window's snapshot scatter:
    # [X(3) | tid bits | ok | normal(3) | mind | maxd] per candidate.
    def _pin(a):
        if a.shape[0] >= C_PATCH:
            return a[:C_PATCH]
        pad = [(0, C_PATCH - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad)

    patch_tri = jnp.concatenate(
        [
            _pin(X),
            _pin(tid_bits)[:, None],
            _pin(ok.astype(jnp.float32))[:, None],
            _pin(normal),
            _pin(mind)[:, None],
            _pin(maxd)[:, None],
        ],
        axis=1,
    )
    patch_mp = (
        out_mp[:P_PATCH] if P >= P_PATCH
        else jnp.pad(out_mp, ((0, P_PATCH - P), (0, 0)))
    )

    wire = jnp.concatenate(
        [
            X.reshape(-1),
            out_kf.reshape(-1),
            out_mp.reshape(-1),
            out_obs.reshape(-1),
        ]
    )
    return {"wire": wire, "patch_tri": patch_tri, "patch_mp": patch_mp}


def split_mapper_wire(out, C=TRI_CAP, K=BA_K, P=BA_P, O=BA_O):
    """Host inverse: flat result -> (X (C,3), out_kf (K,12), out_mp (P,3),
    out_obs (O,2))."""
    import numpy as np

    out = np.asarray(out)  # the ONE pull
    a = C * 3
    b = a + K * 12
    c = b + P * 3
    return (
        out[:a].reshape(C, 3),
        out[a:b].reshape(K, 12),
        out[b:c].reshape(P, 3),
        out[c:].reshape(O, 2),
    )
