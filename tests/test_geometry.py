"""Geometry ops on synthetic scenes: triangulation, PnP-RANSAC, two-view."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from movslam_tpu.ops.triangulate import triangulate_rays
from movslam_tpu.ops.pnp import pnp_ransac
from movslam_tpu.ops.twoview import reconstruct_two_views
from movslam_tpu.ops import lie

pytestmark = pytest.mark.smoke

FX = FY = 320.0
CX, CY = 320.0, 240.0


def _scene(rng, n=200):
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n), rng.uniform(6, 14, n)], -1
    )
    return pts.astype(np.float32)


def _pose(rng, rot_scale=0.1, t_scale=0.5):
    w = rng.normal(0, rot_scale, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    t = rng.normal(0, t_scale, 3).astype(np.float32)
    return R, t


def _project(R, t, pts):
    pc = pts @ R.T + t
    return np.stack(
        [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
    ).astype(np.float32), pc[:, 2]


def test_triangulation_exact(rng):
    pts = _scene(rng, 64)
    R, t = _pose(rng)
    r1 = pts[:, :2] / pts[:, 2:]
    pc2 = pts @ R.T + t
    r2 = pc2[:, :2] / pc2[:, 2:]
    X = np.asarray(triangulate_rays(jnp.asarray(R), jnp.asarray(t), jnp.asarray(r1), jnp.asarray(r2)))
    np.testing.assert_allclose(X, pts, atol=1e-2)


def test_pnp_ransac_with_outliers(rng):
    pts = _scene(rng, 300)
    R, t = _pose(rng)
    uv, z = _project(R, t, pts)
    assert (z > 0).all()
    uv_noisy = uv + rng.normal(0, 0.5, uv.shape)
    out_mask = rng.uniform(size=len(pts)) < 0.3
    uv_noisy[out_mask] += rng.uniform(30, 200, (out_mask.sum(), 2))

    res = pnp_ransac(
        jnp.asarray(pts),
        jnp.asarray(uv_noisy, jnp.float32),
        jnp.ones(len(pts), bool),
        FX, FY, CX, CY,
        jax.random.PRNGKey(0),
        3.0,
        jnp.eye(3), jnp.zeros(3),
    )
    assert bool(res["ok"])
    R_est = np.asarray(res["R"])
    t_est = np.asarray(res["t"])
    # Rotation error < 0.5 deg, translation < 5 cm.
    cos = (np.trace(R_est @ R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
    assert np.linalg.norm(t_est - t) < 0.05
    inl = np.asarray(res["inliers"])
    assert inl[~out_mask].mean() > 0.9
    assert inl[out_mask].mean() < 0.1


def test_pnp_prior_lane_rescues_degenerate_sampling(rng):
    # Too few points for reliable 6-pt sampling but a perfect prior.
    pts = _scene(rng, 8)
    R, t = _pose(rng)
    uv, _ = _project(R, t, pts)
    res = pnp_ransac(
        jnp.asarray(pts), jnp.asarray(uv), jnp.ones(8, bool),
        FX, FY, CX, CY, jax.random.PRNGKey(1), 3.0,
        jnp.asarray(R), jnp.asarray(t),
    )
    assert int(res["n_inliers"]) == 8


def test_two_view_reconstruction(rng):
    pts = _scene(rng, 300)
    R, t = _pose(rng, rot_scale=0.05, t_scale=0.0)
    t = np.array([0.8, 0.1, 0.05], np.float32)  # clear baseline
    uv1, z1 = _project(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), pts)
    uv2, z2 = _project(R, t, pts)
    ok = (z1 > 0) & (z2 > 0)
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    # 20% outliers
    out = rng.uniform(size=len(pts)) < 0.2
    uv2[out] += rng.uniform(20, 100, (out.sum(), 2))

    res = reconstruct_two_views(
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.asarray(ok & True), FX, FY, CX, CY, jax.random.PRNGKey(2),
    )
    assert bool(res["ok"]), (int(res["n_inliers"]), int(res["n_good"]), float(res["parallax_deg"]))
    R_est = np.asarray(res["R21"])
    t_est = np.asarray(res["t21"])
    cos = (np.trace(R_est @ R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 1.0
    # translation up to scale
    t_dir = t / np.linalg.norm(t)
    assert np.dot(t_est, t_dir) > 0.99
    # triangulated points match up to the common scale
    tri = np.asarray(res["triangulated"])
    assert tri.sum() >= 0.6 * (~out).sum()
    X = np.asarray(res["points"])[tri]
    scale = np.median(pts[tri][:, 2] / X[:, 2])
    err = np.linalg.norm(X * scale - pts[tri], axis=-1)
    # Seed-sensitive: per-key medians of both the eigh- and the
    # inverse-iteration-based solver span ~0.08-0.25 on this scene (the
    # RANSAC winner flips with the draw); 0.3 gates real regressions without
    # pinning one lucky draw.
    assert np.median(err) < 0.3, np.median(err)
