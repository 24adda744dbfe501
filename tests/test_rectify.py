"""Stereo rectification (config/rectify.py + Settings raw-rig path).

Covers the reference's Settings::precomputeRectificationMaps semantics
(/root/reference/src/Settings.cc:430-465): Bouguet rectification from
Stereo.T_c1_c2, updated calibration/bf, epipolar row alignment, and the MV
coordinate transform of the applied path (core/stereo_rectified.py) the
reference leaves unconsumed.
"""
import numpy as np
import pytest

from movslam_tpu.config.rectify import (
    init_rectify_map,
    rectify_points,
    remap_bilinear,
    rodrigues_mat_to_vec,
    rodrigues_vec_to_mat,
    stereo_rectify,
)
from movslam_tpu.config.settings import STEREO, Settings


def _euroc_rig():
    K1 = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    d1 = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
    K2 = np.array([[457.587, 0, 379.999], [0, 456.134, 255.238], [0, 0, 1]])
    d2 = (-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05)
    T_c1_c2 = np.array(
        [
            [0.999997256477797, -0.002317135723275, -0.000343393120620, 0.110074137800478],
            [0.002312067192432, 0.999898048507103, -0.014090668452683, -0.000156612054392],
            [0.000376008102320, 0.014089835846691, 0.999900662638081, 0.000889382785432],
            [0, 0, 0, 1.0],
        ]
    )
    return K1, d1, K2, d2, T_c1_c2, (752, 480)


@pytest.mark.smoke
def test_rodrigues_roundtrip(rng):
    for _ in range(20):
        w = rng.normal(0, 1, 3)
        R = rodrigues_vec_to_mat(w)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        # Round-trip through the log map: same ROTATION (the recovered
        # vector may be the equivalent 2*pi-complement for |w| > pi).
        w2 = rodrigues_mat_to_vec(R)
        np.testing.assert_allclose(rodrigues_vec_to_mat(w2), R, atol=1e-9)
        if np.linalg.norm(w) < np.pi:
            np.testing.assert_allclose(w2, w, atol=1e-9)


@pytest.mark.smoke
def test_epipolar_alignment_euroc():
    """After rectification, a world point's two image rows agree and the
    disparity matches fx * b / z."""
    K1, d1, K2, d2, T, size = _euroc_rig()
    Trl = np.linalg.inv(T)
    R, t = Trl[:3, :3], Trl[:3, 3]
    rect = stereo_rectify(K1, d1, K2, d2, size, R, t)
    b = np.linalg.norm(T[:3, 3])

    rng = np.random.default_rng(3)
    # World points in front of the left camera.
    X1 = np.stack(
        [rng.uniform(-2, 2, 200), rng.uniform(-1.5, 1.5, 200), rng.uniform(3, 12, 200)],
        axis=1,
    )
    X2 = X1 @ R.T + t

    def raw_project(X, K, d):
        x, y = X[:, 0] / X[:, 2], X[:, 1] / X[:, 2]
        from movslam_tpu.config.rectify import _distort

        xd, yd = _distort(x, y, d)
        return np.stack(
            [K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]], axis=1
        )

    uv1 = raw_project(X1, K1, d1)
    uv2 = raw_project(X2, K2, d2)
    r1 = rectify_points(uv1, K1, d1, rect["R1"], rect["P1"])
    r2 = rectify_points(uv2, K2, d2, rect["R2"], rect["P2"])

    inb = (
        (r1[:, 0] > 5) & (r1[:, 0] < size[0] - 5)
        & (r1[:, 1] > 5) & (r1[:, 1] < size[1] - 5)
        & (r2[:, 0] > 5) & (r2[:, 0] < size[0] - 5)
    )
    assert inb.sum() > 100
    # Epipolar: same row in both rectified views.
    dy = np.abs(r1[inb, 1] - r2[inb, 1])
    assert dy.max() < 0.1, dy.max()
    # Disparity = fx' * b / z (depth in the RECTIFIED left frame).
    Xr = X1 @ rect["R1"].T
    disp = r1[inb, 0] - r2[inb, 0]
    expect = rect["fc_new"] * b / Xr[inb, 2]
    np.testing.assert_allclose(disp, expect, rtol=1e-3, atol=0.05)


@pytest.mark.smoke
def test_rectify_map_inverts_point_transform():
    """The dense inverse map and the sparse forward transform agree: for a
    rectified pixel r, forward(map(r)) == r."""
    K1, d1, _, _, T, size = _euroc_rig()
    Trl = np.linalg.inv(T)
    rect = stereo_rectify(K1, d1, K1, d1, size, Trl[:3, :3], Trl[:3, 3])
    mx, my = init_rectify_map(K1, d1, rect["R1"], rect["P1"], size)
    assert mx.shape == (size[1], size[0])

    rng = np.random.default_rng(5)
    us = rng.integers(100, size[0] - 100, 50)
    vs = rng.integers(80, size[1] - 80, 50)
    raw = np.stack([mx[vs, us], my[vs, us]], axis=1)
    back = rectify_points(raw, K1, d1, rect["R1"], rect["P1"])
    np.testing.assert_allclose(back[:, 0], us, atol=1e-3)
    np.testing.assert_allclose(back[:, 1], vs, atol=1e-3)


@pytest.mark.smoke
def test_settings_parses_euroc_stereo_yaml():
    """configs/EuRoCStereo.yaml (BASELINE config 4) loads: raw rig detected,
    rectification computed, calibration updated, bf = b * fx'
    (Settings.cc:459-465 semantics)."""
    s = Settings.from_yaml("configs/EuRoCStereo.yaml", STEREO)
    assert s.need_rectify
    assert abs(s.b - 0.1100778) < 1e-3
    c = s.camera1
    assert c.fx == c.fy  # rectified projection: square pixels
    assert not c.dist
    assert abs(s.bf - s.b * c.fx) < 1e-6
    assert s.camera2.fx == c.fx  # shared projection (ZERO_DISPARITY)
    maps = s.rectify_maps()
    assert maps["left"][0].shape == (480, 752)
    assert maps["right"][0].shape == (480, 752)


def test_remap_and_stereo_depth_on_synthetic_raw_pair():
    """End-to-end slice of the applied path: derotate/distort a synthetic
    rectified pair into RAW cameras, then let the Settings rectification
    recover a pair whose LK stereo depth matches ground truth."""
    from movslam_tpu.config.rectify import _distort
    from movslam_tpu.core.stereo_rectified import rectify_pair
    from movslam_tpu.io.synthetic_stereo import SyntheticStereoStream

    # A raw rig: solid distortion + a small relative rotation.
    W, H = 640, 480
    K = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]])
    d = (-0.12, 0.02, 0.0, 0.0)
    Rrel = rodrigues_vec_to_mat([0.004, -0.006, 0.002])
    b = 0.25
    T_c1_c2 = np.eye(4)
    T_c1_c2[:3, :3] = Rrel.T
    T_c1_c2[:3, 3] = Rrel.T @ np.array([b, 0, 0])

    s = Settings()
    from movslam_tpu.core.camera import Pinhole

    s.sensor = STEREO
    s.width = s.new_width = W
    s.height = s.new_height = H
    s.camera1 = Pinhole(320.0, 320.0, 320.0, 240.0, W, H, dist=d)
    s.camera2 = Pinhole(320.0, 320.0, 320.0, 240.0, W, H, dist=d)
    s.T_c1_c2 = T_c1_c2
    s.b = float(np.linalg.norm(T_c1_c2[:3, 3]))
    s.th_depth = 60.0
    s._precompute_rectification()
    assert s.need_rectify

    # Build the raw pair by sampling ideal (rectified-geometry) renders at
    # the raw camera's forward-projected positions: raw(u,v) = ideal(F(u,v))
    # where F undistorts+derotates a raw pixel into the ideal camera.
    stream = SyntheticStereoStream(n_points=300, seed=9, baseline=b)
    left, right = stream.pair(4)
    ideal_l, ideal_r = left.im_gray.copy(), right.im_gray.copy()

    def make_raw(img_ideal, Rcam):
        uu, vv = np.meshgrid(
            np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64)
        )
        x = (uu - K[0, 2]) / K[0, 0]
        y = (vv - K[1, 2]) / K[1, 1]
        from movslam_tpu.config.rectify import _undistort

        xu, yu = _undistort(x.ravel(), y.ravel(), d)
        p = np.stack([xu, yu, np.ones_like(xu)], axis=1) @ Rcam  # Rcam^T rows
        px = 320.0 * p[:, 0] / p[:, 2] + 320.0
        py = 320.0 * p[:, 1] / p[:, 2] + 240.0
        return remap_bilinear(
            img_ideal, px.reshape(H, W).astype(np.float32),
            py.reshape(H, W).astype(np.float32),
        )

    left.im_gray = make_raw(ideal_l, np.eye(3))
    right.im_gray = make_raw(ideal_r, Rrel)

    rectify_pair(left, right, s)

    # Rectified pair must be row-aligned: LK stereo depth ~= ground truth.
    from movslam_tpu.core.stereo import compute_stereo_depth

    class _F:
        pass

    # Probe a grid of textured points via LK.
    import jax.numpy as jnp

    from movslam_tpu.ops.lk import lk_track

    gx, gy = np.meshgrid(
        np.linspace(120, W - 120, 12), np.linspace(100, H - 100, 9)
    )
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32)
    out, ok = lk_track(
        jnp.asarray(left.im_gray, jnp.float32),
        jnp.asarray(right.im_gray, jnp.float32),
        jnp.asarray(pts), jnp.ones(len(pts), bool),
    )
    out, ok = np.asarray(out), np.asarray(ok)
    dy = np.abs(out[:, 1] - pts[:, 1])
    good = ok & (dy < 1.5) & (pts[:, 0] - out[:, 0] > 0.5)
    assert good.sum() > 40, f"only {good.sum()} rectified LK matches"
    disp = pts[good, 0] - out[good, 0]
    z = s.bf / disp
    # Background plane sits at ~bg_depth along the orbit — depths must be
    # positive, finite, and in a plausible band (not degenerate).
    assert np.isfinite(z).all() and (z > 1.0).all() and (z < 100.0).all()
