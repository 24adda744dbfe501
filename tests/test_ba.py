"""Schur-complement LM bundle adjustment on synthetic geometry."""
import pytest
import numpy as np
import jax.numpy as jnp

from movslam_tpu.ops import lie
from movslam_tpu.ops.ba import ba_solve, build_obs_by_point

pytestmark = pytest.mark.smoke

FX = FY = 320.0
CX, CY = 320.0, 240.0


def _make_problem(rng, n_kf=6, n_pts=150, noise_px=0.4):
    pts = np.stack(
        [rng.uniform(-5, 5, n_pts), rng.uniform(-4, 4, n_pts), rng.uniform(8, 16, n_pts)], -1
    ).astype(np.float32)
    Rs, ts = [], []
    for k in range(n_kf):
        w = np.array([0.0, 0.04 * k, 0.0])
        R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.array([-0.5 * k, 0.02 * k, 0.0], np.float32)
        Rs.append(R)
        ts.append(t)
    Rs, ts = np.stack(Rs), np.stack(ts)

    obs_kf, obs_mp, obs_uv = [], [], []
    for k in range(n_kf):
        pc = pts @ Rs[k].T + ts[k]
        uv = np.stack(
            [FX * pc[:, 0] / pc[:, 2] + CX, FY * pc[:, 1] / pc[:, 2] + CY], -1
        )
        vis = (pc[:, 2] > 0.5) & (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
        for p in np.flatnonzero(vis):
            obs_kf.append(k)
            obs_mp.append(p)
            obs_uv.append(uv[p] + rng.normal(0, noise_px, 2))
    return pts, Rs, ts, np.array(obs_kf, np.int32), np.array(obs_mp, np.int32), np.array(obs_uv, np.float32)


def _pad(a, n, fill=0):
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[: len(a)] = a
    return out


def test_ba_recovers_perturbed_geometry(rng):
    pts, Rs, ts, obs_kf, obs_mp, obs_uv = _make_problem(rng)
    K, P = len(Rs), len(pts)
    O = 2048
    n_obs = len(obs_kf)
    assert n_obs < O

    # Perturb everything except KF0 (fixed, like the init KF in LBA).
    Rs_p, ts_p = Rs.copy(), ts.copy()
    for k in range(1, K):
        dw = rng.normal(0, 0.01, 3).astype(np.float32)
        dR = np.asarray(lie.so3_exp(jnp.asarray(dw)))
        Rs_p[k] = dR @ Rs[k]
        ts_p[k] = ts[k] + rng.normal(0, 0.05, 3)
    pts_p = pts + rng.normal(0, 0.10, pts.shape).astype(np.float32)

    obs_valid = np.zeros(O, bool)
    obs_valid[:n_obs] = True
    obp = build_obs_by_point(_pad(obs_mp, O, P), P, 16, O)

    res = ba_solve(
        jnp.asarray(Rs_p), jnp.asarray(ts_p),
        jnp.asarray(np.arange(K) == 0), jnp.ones(K, bool),
        jnp.asarray(pts_p), jnp.ones(P, bool),
        jnp.asarray(_pad(obs_kf, O)), jnp.asarray(_pad(obs_mp, O)),
        jnp.asarray(_pad(obs_uv, O)), jnp.asarray(obs_valid),
        jnp.asarray(obp),
        FX, FY, CX, CY,
    )

    R_out = np.asarray(res["kf_R"])
    t_out = np.asarray(res["kf_t"])
    X_out = np.asarray(res["mp_pos"])

    # Fixed KF untouched.
    np.testing.assert_array_equal(R_out[0], Rs_p[0])

    for k in range(1, K):
        cos = (np.trace(R_out[k] @ Rs[k].T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.15, k

    # Monocular BA with one fixed camera leaves a scale gauge (as in g2o);
    # compare camera centers after scale alignment about the fixed KF.
    C_gt = np.stack([-(Rs[k].T @ ts[k]) for k in range(K)])
    C_es = np.stack([-(R_out[k].T @ t_out[k]) for k in range(K)])
    d_gt = np.linalg.norm(C_gt[1:] - C_gt[0], axis=-1)
    d_es = np.linalg.norm(C_es[1:] - C_es[0], axis=-1)
    s = np.median(d_gt / np.maximum(d_es, 1e-9))
    err_c = np.linalg.norm((C_es[1:] - C_es[0]) * s - (C_gt[1:] - C_gt[0]), axis=-1)
    assert err_c.max() < 0.02, err_c

    err = np.linalg.norm((X_out - C_es[0]) * s + C_es[0] - pts, axis=-1)
    assert np.median(err) < 0.2, np.median(err)

    # chi2 of valid observations small after convergence.
    chi2 = np.asarray(res["chi2"])[:n_obs]
    assert np.median(chi2) < 2.0
    # Cost decreased massively.
    costs = np.asarray(res["costs"])
    assert costs[-1] < res["cost"] * 1.01


def test_ba_flags_outlier_observations(rng):
    pts, Rs, ts, obs_kf, obs_mp, obs_uv = _make_problem(rng, n_kf=4, n_pts=80)
    n_obs = len(obs_kf)
    out_idx = rng.choice(n_obs, size=n_obs // 10, replace=False)
    obs_uv[out_idx] += rng.uniform(15, 60, (len(out_idx), 2)).astype(np.float32)

    K, P, O = len(Rs), len(pts), 1024
    obs_valid = np.zeros(O, bool)
    obs_valid[:n_obs] = True
    obp = build_obs_by_point(_pad(obs_mp, O, P), P, 16, O)

    res = ba_solve(
        jnp.asarray(Rs), jnp.asarray(ts),
        jnp.asarray(np.arange(K) == 0), jnp.ones(K, bool),
        jnp.asarray(pts), jnp.ones(P, bool),
        jnp.asarray(_pad(obs_kf, O)), jnp.asarray(_pad(obs_mp, O)),
        jnp.asarray(_pad(obs_uv, O)), jnp.asarray(obs_valid),
        jnp.asarray(obp), FX, FY, CX, CY,
    )
    chi2 = np.asarray(res["chi2"])[:n_obs]
    flagged = chi2 > 5.0  # the reference's pruning threshold
    hit = np.zeros(n_obs, bool)
    hit[out_idx] = True
    assert flagged[hit].mean() > 0.95  # outliers caught
    assert flagged[~hit].mean() < 0.08  # inliers kept (small false-positive rate)
