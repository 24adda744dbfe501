"""Batched SE(3) pose-graph optimization (JAX, TPU-first).

Fills the pose-graph gap the reference left vestigial: its tree ships
prebuilt SESync/LSChol libraries that are referenced nowhere
(/root/reference/CMakeLists.txt links none of them; SURVEY.md §2.6), while
multi-map recovery (Atlas) has no merge/relaxation step. This module
provides the TPU-native equivalent: Levenberg-Marquardt over relative-pose
edges with per-edge Jacobians computed by vmapped forward-mode autodiff and
the dense 6Kx6K normal system solved on the MXU — the right shape for
loop-closure relaxation and multi-map alignment at Atlas scale.

Conventions: node poses are world-from-camera... NO — camera-from-world
(T_iw), matching the rest of the framework; an edge (i, j) measures
T_ij = T_iw ∘ T_jw^{-1}; the residual is log(T_ij_meas^{-1} ∘ T_i ∘ T_j^{-1}).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .lie import se3_compose, se3_exp, se3_inverse, se3_log
from .linalg import solve_psd

LM_ITERS = 20


def _edge_residual(xi_i, xi_j, Ri, ti, Rj, tj, Rm, tm):
    """Residual of one edge with left-multiplied increments xi on both nodes."""
    dRi, dti = se3_exp(xi_i)
    dRj, dtj = se3_exp(xi_j)
    Ri_, ti_ = se3_compose(dRi, dti, Ri, ti)
    Rj_, tj_ = se3_compose(dRj, dtj, Rj, tj)
    Rj_inv, tj_inv = se3_inverse(Rj_, tj_)
    Rij, tij = se3_compose(Ri_, ti_, Rj_inv, tj_inv)
    Rm_inv, tm_inv = se3_inverse(Rm, tm)
    Re, te = se3_compose(Rm_inv, tm_inv, Rij, tij)
    return se3_log(Re, te)


def _edge_lin(Ri, ti, Rj, tj, Rm, tm):
    """Residual at zero increment + Jacobians wrt both nodes: (r, Ji, Jj)."""
    zero = jnp.zeros(6)
    r = _edge_residual(zero, zero, Ri, ti, Rj, tj, Rm, tm)
    Ji = jax.jacfwd(_edge_residual, argnums=0)(zero, zero, Ri, ti, Rj, tj, Rm, tm)
    Jj = jax.jacfwd(_edge_residual, argnums=1)(zero, zero, Ri, ti, Rj, tj, Rm, tm)
    return r, Ji, Jj


@functools.partial(jax.jit, static_argnames=("iters",))
def pose_graph_solve(
    node_R,
    node_t,
    node_fixed,
    node_valid,
    edge_i,
    edge_j,
    edge_R,
    edge_t,
    edge_w,
    iters=LM_ITERS,
):
    """LM pose-graph relaxation.

    node_R: (K,3,3), node_t: (K,3) camera-from-world poses.
    node_fixed/valid: (K,) bool (gauge: fix at least one node).
    edge_i/j: (E,) int32; edge_R/t: measured relative poses T_i T_j^-1;
    edge_w: (E,) weights (0 disables an edge; padding).

    Returns (node_R, node_t, costs (iters,))."""
    K = node_R.shape[0]
    free = node_valid & ~node_fixed

    def linearize(R, t):
        r, Ji, Jj = jax.vmap(_edge_lin)(
            R[edge_i], t[edge_i], R[edge_j], t[edge_j], edge_R, edge_t
        )  # (E,6), (E,6,6), (E,6,6)
        w = edge_w * node_valid[edge_i] * node_valid[edge_j]
        Ji = Ji * free[edge_i][:, None, None]
        Jj = Jj * free[edge_j][:, None, None]
        rw = r * w[:, None]
        cost = jnp.sum(rw * r)

        # Dense normal system via block scatter-adds.
        H = jnp.zeros((K * K, 6, 6))
        Jiw = Ji * w[:, None, None]
        Jjw = Jj * w[:, None, None]
        H = H.at[edge_i * K + edge_i].add(jnp.einsum("eij,eik->ejk", Jiw, Ji))
        H = H.at[edge_j * K + edge_j].add(jnp.einsum("eij,eik->ejk", Jjw, Jj))
        H = H.at[edge_i * K + edge_j].add(jnp.einsum("eij,eik->ejk", Jiw, Jj))
        H = H.at[edge_j * K + edge_i].add(jnp.einsum("eij,eik->ejk", Jjw, Ji))
        H = H.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(K * 6, K * 6)

        g = jnp.zeros((K, 6))
        g = g.at[edge_i].add(jnp.einsum("eij,ei->ej", Jiw, r))
        g = g.at[edge_j].add(jnp.einsum("eij,ei->ej", Jjw, r))
        return H, -g.reshape(-1), cost

    def lm_step(carry, _):
        R, t, lam = carry
        H, b, cost0 = linearize(R, t)
        m = jnp.repeat(free.astype(jnp.float32), 6)
        Hd = (H + lam * jnp.eye(K * 6)) * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        dxi = solve_psd(Hd + 1e-8 * jnp.eye(K * 6), b * m).reshape(K, 6)
        dxi = jnp.where(jnp.isfinite(dxi), dxi, 0.0)
        dR, dt = se3_exp(dxi)
        R_new, t_new = se3_compose(dR, dt, R, t)
        R_new = jnp.where(free[:, None, None], R_new, R)
        t_new = jnp.where(free[:, None], t_new, t)
        _, _, cost1 = linearize(R_new, t_new)
        accept = (cost1 < cost0) & jnp.isfinite(cost1)
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (R, t, lam), cost1

    (R, t, _), costs = jax.lax.scan(
        lm_step, (node_R, node_t, jnp.asarray(1e-6, jnp.float32)), None, length=iters
    )
    return R, t, costs


def relative_pose(Ri, ti, Rj, tj):
    """Edge measurement T_i ∘ T_j^{-1} from two absolute poses (numpy ok)."""
    import numpy as np

    Rj_inv = np.swapaxes(Rj, -1, -2)
    tj_inv = -np.einsum("...ij,...j->...i", Rj_inv, tj)
    return Ri @ Rj_inv, np.einsum("...ij,...j->...i", Ri, tj_inv) + ti
