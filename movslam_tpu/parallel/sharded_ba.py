"""Multi-chip bundle adjustment: point-sharded Schur reduction over a mesh.

Scales the local/global BA of ops/ba.py across devices: map points (and all
their observations, kept point-contiguous) are sharded over the mesh's
"data" axis; every device linearizes its shard, builds its partial reduced
camera system, and the dense 6Kx6K Schur blocks are summed with one psum
over ICI. The (small) camera solve is replicated; landmark back-substitution
stays local to each shard. This is the TPU-native answer to the reference's
single-thread CSparse solve (Optimizer.cc:532-541) at scales where one chip
isn't enough (dense multi-map BA, evaluation fan-out).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.ba import _residual_jacobians, _total_cost
from ..ops.lie import se3_compose, se3_exp
from ..ops.linalg import inv3x3, solve_psd

LM_ITERS = 10


def _local_reduced_system(kf_R, kf_t, free, mp_pos, mp_valid,
                          obs_kf, obs_mp, obs_uv, obs_w, obs_by_point,
                          fx, fy, cx, cy, lam):
    """Per-shard contribution to the reduced camera system.

    All *point* and *obs* arrays are the local shard; obs_mp indexes the
    LOCAL point array. Returns (S_partial (K*6, K*6), rhs_partial (K, 6),
    Hll_inv (P_loc, 3, 3), g_l (P_loc, 3), W (O_loc, 6, 3))."""
    K = kf_R.shape[0]
    Ploc = mp_pos.shape[0]
    O = obs_kf.shape[0]
    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)

    r, Jp, Jl, w, chi2, z = _residual_jacobians(
        kf_R, kf_t, mp_pos, obs_kf, obs_mp, obs_uv, obs_w, fx, fy, cx, cy
    )
    Jp = Jp * free[obs_kf][:, None, None]
    Jpw = Jp * w[:, None, None]
    Jlw = Jl * w[:, None, None]

    g_p = -jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jpw, r), obs_kf, num_segments=K)
    g_l = -jax.ops.segment_sum(jnp.einsum("oij,oi->oj", Jlw, r), obs_mp, num_segments=Ploc)
    Hpp = jax.ops.segment_sum(jnp.einsum("oij,oik->ojk", Jpw, Jp), obs_kf, num_segments=K)
    Hll = jax.ops.segment_sum(jnp.einsum("oij,oik->ojk", Jlw, Jl), obs_mp, num_segments=Ploc)
    W = jnp.einsum("oij,oik->ojk", Jpw, Jl)

    Hll_inv = inv3x3(Hll + (lam + 1e-8) * eye3[None], eps=1e-30)

    Hinv_gl = jnp.einsum("pij,pj->pi", Hll_inv, g_l)
    rhs = g_p - jax.ops.segment_sum(
        jnp.einsum("oij,oj->oi", W, Hinv_gl[obs_mp]), obs_kf, num_segments=K
    )

    # Schur pair accumulation over this shard's points: factored one-hot
    # einsums (see ops/ba.schur_reduce — the MOPP^2 scatter-add loop this
    # replaces serialized thousands of tiny kernels on the scalar core).
    W_pad = jnp.concatenate([W, jnp.zeros((1, 6, 3))], axis=0)
    kf_pad = jnp.concatenate([obs_kf, jnp.zeros((1,), obs_kf.dtype)], axis=0)
    Wp = W_pad[obs_by_point]
    kfp = kf_pad[obs_by_point]
    pad_mask = (obs_by_point < O).astype(jnp.float32)
    oh = jax.nn.one_hot(kfp, K, dtype=jnp.float32) * pad_mask[..., None]
    Yp = jnp.einsum("pmij,pjk->pmik", Wp, Hll_inv)
    U = jnp.einsum("pma,pmik->paik", oh, Yp)
    V = jnp.einsum("pmb,pmjk->pbjk", oh, Wp)
    S = -jnp.einsum(
        "paik,pbjk->abij", U, V, preferred_element_type=jnp.float32
    ).reshape(K * K, 6, 6)
    S = S.at[jnp.arange(K) * K + jnp.arange(K)].add(Hpp)
    S = S.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    cost = _total_cost(chi2, obs_w)
    return S, rhs, Hll_inv, g_l, W, cost


def make_sharded_ba(mesh: Mesh, iters=LM_ITERS, axis="data"):
    """Build a jitted, mesh-sharded BA step.

    Expects points/observations pre-partitioned so each device's shard is
    point-contiguous: leading dims of mp_*, obs_*, obs_by_point are sharded
    over `axis`; keyframe arrays are replicated. obs_by_point indexes each
    shard's local observation block."""

    pt_spec = P(axis)
    rep = P()

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, pt_spec, pt_spec, pt_spec, pt_spec,
                  pt_spec, pt_spec, pt_spec, rep, rep, rep, rep),
        out_specs=(rep, rep, pt_spec, rep),
        check_vma=False,
    )
    def step(kf_R, kf_t, kf_fixed, kf_valid, mp_pos, mp_valid,
             obs_kf, obs_mp, obs_uv, obs_valid, obs_by_point,
             fx, fy, cx, cy):
        free = kf_valid & ~kf_fixed
        K = kf_R.shape[0]
        obs_w = obs_valid.astype(jnp.float32) * mp_valid[obs_mp] * kf_valid[obs_kf]

        def lm_step(carry, _):
            R, t, X, lam = carry
            S, rhs, Hll_inv, g_l, W, cost0 = _local_reduced_system(
                R, t, free, X, mp_valid, obs_kf, obs_mp, obs_uv, obs_w,
                obs_by_point, fx, fy, cx, cy, lam,
            )
            # ICI collectives: sum the reduced camera system over shards.
            S = jax.lax.psum(S, axis)
            rhs = jax.lax.psum(rhs, axis)

            m = jnp.repeat(free.astype(jnp.float32), 6)
            lamI = lam * jnp.eye(K * 6)
            S = (S + lamI) * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            b = rhs.reshape(-1) * m
            dxi = solve_psd(S + 1e-6 * jnp.eye(K * 6), b).reshape(K, 6)
            dxi = jnp.where(jnp.isfinite(dxi), dxi, 0.0)

            Wt_dxi = jax.ops.segment_sum(
                jnp.einsum("oij,oi->oj", W, dxi[obs_kf]), obs_mp,
                num_segments=X.shape[0],
            )
            dX = jnp.einsum("pij,pj->pi", Hll_inv, g_l - Wt_dxi)
            dX = jnp.where(jnp.isfinite(dX), dX, 0.0) * mp_valid[:, None]

            dR, dt = se3_exp(dxi)
            R_new, t_new = se3_compose(dR, dt, R, t)
            R_new = jnp.where(free[:, None, None], R_new, R)
            t_new = jnp.where(free[:, None], t_new, t)
            X_new = X + dX

            # Recompute cost for acceptance (global over shards).
            r, _, _, w1, chi2, _ = _residual_jacobians(
                R_new, t_new, X_new, obs_kf, obs_mp, obs_uv, obs_w, fx, fy, cx, cy
            )
            cost1 = jax.lax.psum(_total_cost(chi2, obs_w), axis)
            cost0 = jax.lax.psum(cost0, axis)
            accept = (cost1 < cost0) & jnp.isfinite(cost1)
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            X = jnp.where(accept, X_new, X)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e6)
            return (R, t, X, lam), cost1

        init = (kf_R, kf_t, mp_pos, jnp.asarray(1e-4, jnp.float32))
        (R, t, X, _), costs = jax.lax.scan(lm_step, init, None, length=iters)
        return R, t, X, costs

    return jax.jit(step)
