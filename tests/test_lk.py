"""Batched pyramidal LK vs known shifts and cv2 golden."""
import pytest
import numpy as np
import jax.numpy as jnp

from movslam_tpu.ops.lk import lk_track

pytestmark = pytest.mark.smoke


def _textured(rng, H=240, W=320):
    img = rng.normal(128, 30, (H + 40, W + 40))
    # Smooth slightly so gradients are informative
    k = np.ones((3, 3)) / 9.0
    from scipy.signal import convolve2d

    img = convolve2d(img, k, mode="same", boundary="symm")
    return np.clip(img, 0, 255)


def test_lk_recovers_translation(rng):
    big = _textured(rng)
    dx, dy = 3.0, -2.0
    prev = big[20:260, 20:340]
    cur = big[20 + int(dy) : 260 + int(dy), 20 + int(dx) : 340 + int(dx)]

    pts = np.stack(
        np.meshgrid(np.arange(60, 260, 40), np.arange(60, 180, 40)), -1
    ).reshape(-1, 2).astype(np.float32)
    valid = np.ones(len(pts), bool)

    new_pts, status = lk_track(
        jnp.asarray(prev, jnp.float32), jnp.asarray(cur, jnp.float32),
        jnp.asarray(pts), jnp.asarray(valid),
    )
    new_pts = np.asarray(new_pts)
    status = np.asarray(status)
    assert status.all()
    flow = new_pts - pts
    # shifting the crop window by (dx,dy) moves content by (-dx,-dy)
    np.testing.assert_allclose(flow[:, 0], -dx, atol=0.25)
    np.testing.assert_allclose(flow[:, 1], -dy, atol=0.25)


def test_lk_close_to_cv2(rng):
    import cv2

    big = _textured(rng)
    prev = big[20:260, 20:340].astype(np.uint8)
    # subpixel-ish shift via affine warp
    M = np.float32([[1, 0, -1.5], [0, 1, 0.75]])
    cur = cv2.warpAffine(prev, M, (prev.shape[1], prev.shape[0]))

    pts = np.stack(
        np.meshgrid(np.arange(60, 260, 32), np.arange(60, 180, 32)), -1
    ).reshape(-1, 2).astype(np.float32)

    cv_pts, cv_status, _ = cv2.calcOpticalFlowPyrLK(
        prev, cur, pts.reshape(-1, 1, 2), None,
        winSize=(31, 31), maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 20, 0.01),
    )
    cv_pts = cv_pts.reshape(-1, 2)

    new_pts, status = lk_track(
        jnp.asarray(prev, jnp.float32), jnp.asarray(cur, jnp.float32),
        jnp.asarray(pts), jnp.ones(len(pts), bool),
    )
    new_pts = np.asarray(new_pts)
    ok = cv_status.reshape(-1).astype(bool) & np.asarray(status)
    assert ok.sum() >= len(pts) * 0.8
    err = np.linalg.norm(new_pts[ok] - cv_pts[ok], axis=-1)
    assert np.median(err) < 0.5, f"median disagreement {np.median(err)}"
