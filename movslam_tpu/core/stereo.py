"""Stereo depth from batched left->right LK matching.

Replaces Frame::ComputeStereoMatches (/root/reference/src/Frame.cc:281-354):
cv::calcOpticalFlowPyrLK from the left features into the right image, a
y-epipolar gate, disparity bounds, and a median-distance outlier trim — here
as one batched device LK call plus vectorized gates.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.lk import lk_track

EPIPOLAR_Y = 2.0  # max |dy| for a rectified match (Frame.cc y gate)
MIN_DISPARITY = 0.1


def compute_stereo_depth(frame, img_left, img_right, settings):
    """Fill frame.depth_right / frame.uright from rectified stereo."""
    n = frame.n
    frame.depth_right = np.full(n, -1.0, np.float64)
    frame.uright = np.full(n, -1.0, np.float64)
    if n == 0 or settings.bf <= 0:
        return

    cap = 2048
    pts = np.zeros((cap, 2), np.float32)
    valid = np.zeros(cap, bool)
    k = min(n, cap)
    src = frame.pts_raw if len(frame.pts_raw) else frame.pts
    pts[:k] = src[:k]
    valid[:k] = True

    out_pts, status = lk_track(
        jnp.asarray(img_left, jnp.float32),
        jnp.asarray(img_right, jnp.float32),
        jnp.asarray(pts),
        jnp.asarray(valid),
    )
    out = np.asarray(out_pts)[:k]
    ok = np.asarray(status)[:k]

    dy = np.abs(out[:, 1] - pts[:k, 1])
    disp = pts[:k, 0] - out[:, 0]
    good = ok & (dy < EPIPOLAR_Y) & (disp > MIN_DISPARITY) & (disp < settings.bf)

    depth = np.where(good, settings.bf / np.maximum(disp, MIN_DISPARITY), -1.0)

    # Median-distance outlier trim (Frame.cc:334-352-style).
    if good.sum() > 10:
        med = np.median(depth[good])
        good &= depth < 6.0 * med
        depth = np.where(good, depth, -1.0)

    frame.depth_right[:k] = depth
    frame.uright[:k] = np.where(good, out[:, 0], -1.0)
