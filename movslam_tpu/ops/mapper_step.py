"""Fused per-keyframe mapper program: triangulation + local BA in ONE dispatch.

The reference's mapper thread runs CreateNewMapPoints (per-pair
cv::triangulatePoints, /root/reference/src/LocalMapping.cc:220-501) and then
LocalBundleAdjustment (g2o, Optimizer.cc:461-841) as separate synchronous
stages. Through a remote TPU every dispatch costs ~30 ms and every pull ~40 ms
of fixed RTT, so the TPU build fuses both stages into one jitted program with
a single flat result wire:

    inputs : tri_wire  (C+1, 16) — row 0 = P1 flat; rows 1.. =
             [P2 flat(12) | uv1(2) | uv2(2)] per candidate pair
             ba_wire   flat f32 — the ops.ba.ba_solve_wire layout
    output : flat f32 [X C*3 | out_kf K*12 | out_mp P*3 | out_obs O*2]

All shapes are PINNED (one compiled variant, ever): the host pads candidate
pairs to C and the BA problem to (K, P, O) — bucket churn previously cost a
0.6 s re-trace + compile-cache load per new shape combination mid-run.

The driving LocalMapping dispatches this at keyframe n and pulls the result
at keyframe n+1 (deferred two-phase commit): by then the device has long
finished, so the pull costs only the RTT, and the solve fully overlaps the
tracking of the frames in between — the TPU-native equivalent of the
reference's mapper thread overlapping its tracking thread (System.cc:129).
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

# Two fixed size classes: SMALL covers the common live local-BA problem
# (<=32 KFs, <=1024 points, <=4096 obs, <=1024 tri pairs) at ~half the BIG
# variant's device time — the fused mapper program sits on the device-serial
# critical path (window program + mapper program per keyframe cycle), so its
# compute directly bounds end-to-end fps. BIG is the cap. Exactly these two
# variants compile; the dispatcher picks per keyframe.
MAPPER_SMALL = {"C": 1024, "K": 32, "P": 1024, "O": 4096}
MAPPER_BIG = {"C": TRI_CAP, "K": BA_K, "P": BA_P, "O": BA_O}


@functools.partial(
    jax.jit, static_argnames=("C", "K", "P", "O", "MOPP", "iters")
)
def mapper_step_wire(
    tri_wire, ba_wire, intr, bf, *, C=TRI_CAP, K=BA_K, P=BA_P, O=BA_O,
    MOPP=BA_MOPP, iters=10,
):
    """One keyframe's device work: C-pair DLT triangulation + (K,P,O) LM BA.

    Returns flat f32: [X C*3 | out_kf K*12 | out_mp P*3 | out_obs O*2].
    Padded rows are harmless: zero tri rows triangulate to garbage the host
    gates away; zero-validity BA rows contribute nothing and fixed/invalid
    keyframes come back unchanged.
    """
    P1 = tri_wire[0, 0:12].reshape(3, 4)
    P2s = tri_wire[1:, 0:12].reshape(-1, 3, 4)
    uv1 = tri_wire[1:, 12:14]
    uv2 = tri_wire[1:, 14:16]
    X = triangulate_pairs(P1, P2s, uv1, uv2)  # (C, 3)

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
    return jnp.concatenate(
        [
            X.reshape(-1),
            out_kf.reshape(-1),
            out_mp.reshape(-1),
            out_obs.reshape(-1),
        ]
    )


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
