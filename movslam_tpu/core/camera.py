"""Pinhole camera model (JAX + NumPy duals).

Equivalent of the reference's GeometricCamera/Pinhole
(/root/reference/include/CameraModels/GeometricCamera.h:61-89,
Pinhole.cpp). Only PinHole/Rectified exist in the reference
(Settings.cc:209-271); distortion is handled by undistorting keypoints once
at extraction (Frame.cc:682-713), so the core model is the linear K.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Pinhole:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int = 640
    height: int = 480
    dist: tuple = ()  # (k1, k2, p1, p2[, k3]) — empty means rectified

    def K(self):
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], np.float32
        )

    def project(self, xyz):
        """Camera-frame points (..., 3) -> pixels (..., 2). JAX-safe."""
        z = xyz[..., 2]
        u = self.fx * xyz[..., 0] / z + self.cx
        v = self.fy * xyz[..., 1] / z + self.cy
        return jnp.stack([u, v], axis=-1) if isinstance(xyz, jnp.ndarray) else np.stack([u, v], axis=-1)

    def unproject(self, uv):
        """Pixels (..., 2) -> unit-depth rays (..., 3)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        ones = jnp.ones_like(x) if isinstance(uv, jnp.ndarray) else np.ones_like(x)
        stack = jnp.stack if isinstance(uv, jnp.ndarray) else np.stack
        return stack([x, y, ones], axis=-1)

    def undistort_points(self, uv):
        """Iteratively undistort pixel coords (NumPy). No-op when dist empty.

        Replaces cv::undistortPoints usage at Frame.cc:682-713."""
        if not self.dist or not any(self.dist):
            return uv
        k = list(self.dist) + [0.0] * (5 - len(self.dist))
        k1, k2, p1, p2, k3 = k[:5]
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        x0, y0 = x.copy(), y.copy()
        for _ in range(8):
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
            dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            x = (x0 - dx) / radial
            y = (y0 - dy) / radial
        out = np.stack([x * self.fx + self.cx, y * self.fy + self.cy], axis=-1)
        return out.astype(np.float32)

    def undistorted_bounds(self):
        """(minx, maxx, miny, maxy) of the undistorted image — the reference's
        mnMinX/mnMaxX/mnMinY/mnMaxY (Frame::ComputeImageBounds)."""
        if not self.dist or not any(self.dist):
            return (0.0, float(self.width), 0.0, float(self.height))
        corners = np.array(
            [[0.0, 0.0], [self.width, 0.0], [0.0, self.height],
             [self.width, self.height]], np.float32,
        )
        cu = self.undistort_points(corners)
        return (
            float(min(cu[0, 0], cu[2, 0])), float(max(cu[1, 0], cu[3, 0])),
            float(min(cu[0, 1], cu[1, 1])), float(max(cu[2, 1], cu[3, 1])),
        )

    def in_image(self, uv, margin=0):
        return (
            (uv[..., 0] >= margin)
            & (uv[..., 0] < self.width - margin)
            & (uv[..., 1] >= margin)
            & (uv[..., 1] < self.height - margin)
        )
