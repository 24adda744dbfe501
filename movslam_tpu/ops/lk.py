"""Batched pyramidal Lucas-Kanade optical flow (JAX, TPU-first).

Replaces the reference's cv::calcOpticalFlowPyrLK calls
(/root/reference/src/MOVExtractor.cc:91,196,347 and Frame.cc stereo matching):
window 31x31, 3 pyramid levels, 20 iterations, min-eigenvalue quality gate
(OPTFLOW_LK_GET_MIN_EIGENVALS with threshold 1e-4).

Instead of per-point CPU loops, all N points advance together: each LK
iteration is a batch of (N, K, K) bilinear gathers and (N, 2, 2) solves on
the VPU; the fixed iteration count replaces the epsilon early-exit with
masked convergence (identical fixed point, jit-compatible).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .image import build_pyramid, sample_patches

WIN_HALF = 15  # 31x31 window, matching cv::Size(31, 31)
LEVELS = 3
ITERS = 20
EPS = 0.01
MIN_EIG = 1e-4


LOCAL = 64  # per-point local window side extracted once per level


def _sample_local(patches, local_xy, half):
    """Bilinear (K, K) sub-patches from per-point LOCAL windows.

    patches: (N, L, L); local_xy: (N, 2) centers in local coords. Small
    batched weight matmuls (N, K, L) x (N, L, L) — the per-iteration cost of
    LK after the one-time local extraction."""
    N, L, _ = patches.shape
    K = 2 * half + 1
    d = jnp.arange(K, dtype=jnp.float32) - half
    li = jnp.arange(L, dtype=jnp.float32)
    yi = jnp.clip(local_xy[:, 1, None] + d[None, :], 0.0, L - 1.000001)
    xi = jnp.clip(local_xy[:, 0, None] + d[None, :], 0.0, L - 1.000001)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(li[None, None, :] - yi[:, :, None]))
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(li[None, None, :] - xi[:, :, None]))
    rows = jnp.einsum("nkl,nlm->nkm", Wy, patches, preferred_element_type=jnp.float32)
    return jnp.einsum("nkm,njm->nkj", rows, Wx, preferred_element_type=jnp.float32)


def _lk_level(prev_img, cur_img, pts_prev, guess, valid, half, iters):
    """One pyramid level. pts_prev: template centers in prev_img coords.
    guess: current flow estimate (N, 2). Returns (flow, min_eig).

    TPU-first structure: ONE local (LOCAL x LOCAL) window per point is
    extracted from each image via the dense-weight matmul (ops/image), and
    every LK iteration then samples inside the local windows with small
    batched matmuls — the full-image matmul cost is paid once per level
    instead of once per iteration. Flow beyond the local slack
    ((LOCAL - K)/2 - 1 px per level) clamps, which the pyramid absorbs for
    codec-scale motion (merange=64 at full res)."""
    # Template patch + gradients from ONE local window of prev_img: the
    # central K x K slice of the bilinearly-extracted window equals the
    # direct bilinear sample, and central differences inside the window
    # approximate the sampled gradient images (two full-image extractions
    # per level instead of four).
    Lh = LOCAL // 2
    Pwin = sample_patches(prev_img, pts_prev, Lh - 1)  # (N, L, L)
    L = Pwin.shape[1]
    c0 = (L - 1) // 2 - half
    T = Pwin[:, c0 : c0 + 2 * half + 1, c0 : c0 + 2 * half + 1]
    Gx_full = 0.5 * (
        jnp.pad(Pwin, ((0, 0), (0, 0), (0, 1)), mode="edge")[:, :, 1:]
        - jnp.pad(Pwin, ((0, 0), (0, 0), (1, 0)), mode="edge")[:, :, :-1]
    )
    Gy_full = 0.5 * (
        jnp.pad(Pwin, ((0, 0), (0, 1), (0, 0)), mode="edge")[:, 1:, :]
        - jnp.pad(Pwin, ((0, 0), (1, 0), (0, 0)), mode="edge")[:, :-1, :]
    )
    Gx = Gx_full[:, c0 : c0 + 2 * half + 1, c0 : c0 + 2 * half + 1]
    Gy = Gy_full[:, c0 : c0 + 2 * half + 1, c0 : c0 + 2 * half + 1]
    # Local search windows in cur_img, centered at pts_prev + guess.
    centers = pts_prev + guess
    Jwin = sample_patches(cur_img, centers, Lh - 1)  # (N, L, L)
    slack = (L - (2 * half + 1)) // 2 - 1

    gxx = jnp.sum(Gx * Gx, axis=(1, 2))
    gxy = jnp.sum(Gx * Gy, axis=(1, 2))
    gyy = jnp.sum(Gy * Gy, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    inv_scale = 1.0 / jnp.maximum(det, 1e-12)

    # Minimum eigenvalue of the normalized spatial gradient matrix.
    K = 2 * half + 1
    tr = gxx + gyy
    disc = jnp.sqrt(jnp.maximum((gxx - gyy) ** 2 + 4 * gxy * gxy, 0.0))
    min_eig = 0.5 * (tr - disc) / (K * K)

    def body(i, state):
        flow, active = state
        # Local coords of the tracked center inside Jwin.
        local = flow - guess + (L - 1) / 2.0
        local = jnp.clip(local, half, L - 1 - half)
        J = _sample_local(Jwin, local, half)
        diff = T - J
        bx = jnp.sum(diff * Gx, axis=(1, 2))
        by = jnp.sum(diff * Gy, axis=(1, 2))
        # 2x2 solve: G^-1 b
        dx = (gyy * bx - gxy * by) * inv_scale
        dy = (gxx * by - gxy * bx) * inv_scale
        step = jnp.stack([dx, dy], axis=-1)
        step = jnp.where(active[:, None], step, 0.0)
        new_flow = flow + step
        # Clamp to the local window's slack around the initial guess.
        new_flow = jnp.clip(new_flow, guess - slack, guess + slack)
        still = active & (jnp.sum(step * step, axis=-1) >= EPS * EPS)
        return new_flow, still

    active0 = valid & (det > 1e-12)
    flow, _ = jax.lax.fori_loop(0, iters, body, (guess, active0))
    return flow, min_eig


@functools.partial(jax.jit, static_argnames=("levels", "iters", "half"))
def lk_track(prev_img, cur_img, pts, valid, levels=LEVELS, iters=ITERS, half=WIN_HALF):
    """Track pts (N, 2) from prev_img to cur_img.

    prev_img/cur_img: (H, W) uint8 or f32.
    Returns (new_pts (N, 2) f32, status (N,) bool).

    Status mirrors the reference's acceptance (MOVExtractor.cc:98): tracked
    point inside the image and the gradient matrix well-conditioned
    (min eigenvalue > 1e-4 at the finest level).
    """
    H, W = cur_img.shape
    prev_pyr = build_pyramid(prev_img, levels)
    cur_pyr = build_pyramid(cur_img, levels)

    flow = jnp.zeros_like(pts)
    min_eig = jnp.zeros((pts.shape[0],), jnp.float32)
    for lvl in range(levels - 1, -1, -1):
        scale = 2.0**lvl
        flow, min_eig = _lk_level(
            prev_pyr[lvl], cur_pyr[lvl], pts / scale, flow, valid, half, iters
        )
        if lvl > 0:
            flow = flow * 2.0

    new_pts = pts + flow
    inb = (
        (new_pts[:, 0] >= 0)
        & (new_pts[:, 1] >= 0)
        & (new_pts[:, 0] < W)
        & (new_pts[:, 1] < H)
    )
    status = valid & inb & (min_eig > MIN_EIG)
    return new_pts, status
