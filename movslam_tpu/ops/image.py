"""Image sampling / pyramid primitives (JAX, batched, TPU-friendly)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear_sample(img, xy):
    """Bilinearly sample img (H, W) f32 at xy (..., 2) float coords.

    Coordinates outside the image are clamped to the border (cv2
    BORDER_REPLICATE-like). Returns (...,) f32.
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.000001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def sample_patches(img, centers_xy, half):
    """Sample (2*half+1)^2 patches bilinearly around centers.

    img: (H, W) f32; centers_xy: (N, 2). Returns (N, K, K) with K = 2*half+1.

    TPU-first formulation: random per-element gathers route through the
    scalar core (catastrophic — a 31x31x512 LK iteration measured ~1.4 s);
    instead the bilinear interpolation is expressed as two DENSE weight
    matmuls on the MXU. Row weights W_y[n,i,h] = max(0, 1-|h - y_ni|) are
    exactly the bilinear hat function, so
        patches = (W_y @ img) "rows", then contracted with W_x "cols".
    Border behavior: coordinates clamp to the image rectangle
    (BORDER_REPLICATE-like, matching the gather version within the border
    pixel)."""
    H, W = img.shape
    K = 2 * half + 1
    img = img.astype(jnp.float32)
    d = jnp.arange(K, dtype=jnp.float32) - half
    x = jnp.clip(centers_xy[:, 0], 0.0, W - 1.000001)
    y = jnp.clip(centers_xy[:, 1], 0.0, H - 1.000001)
    yi = jnp.clip(y[:, None] + d[None, :], 0.0, H - 1.000001)  # (N, K)
    xi = jnp.clip(x[:, None] + d[None, :], 0.0, W - 1.000001)  # (N, K)

    h_iota = jnp.arange(H, dtype=jnp.float32)
    w_iota = jnp.arange(W, dtype=jnp.float32)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(h_iota[None, None, :] - yi[:, :, None]))
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(w_iota[None, None, :] - xi[:, :, None]))

    N = centers_xy.shape[0]
    # (N*K, H) @ (H, W) -> (N, K, W): one big MXU matmul.
    rows = (Wy.reshape(N * K, H) @ img).reshape(N, K, W)
    # Batched (K, W) @ (W, K) col contraction.
    return jnp.einsum(
        "nkw,njw->nkj", rows, Wx, preferred_element_type=jnp.float32
    )


def gaussian_downsample(img):
    """Blur with the 5-tap binomial kernel and decimate by 2 (pyrDown-like)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], jnp.float32) / 16.0
    x = img.astype(jnp.float32)
    # Separable convolution via padding + weighted shifts (XLA fuses this).
    xp = jnp.pad(x, ((2, 2), (0, 0)), mode="edge")
    x = sum(k[i] * xp[i : i + x.shape[0], :] for i in range(5))
    xp = jnp.pad(x, ((0, 0), (2, 2)), mode="edge")
    x = sum(k[i] * xp[:, i : i + img.shape[1]] for i in range(5))
    return x[::2, ::2]


def scharr_gradients(img):
    """Central-difference gradients (dx, dy), each (H, W) f32."""
    x = img.astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1)), mode="edge")
    gx = 0.5 * (xp[:, 2:] - xp[:, :-2])
    yp = jnp.pad(x, ((1, 1), (0, 0)), mode="edge")
    gy = 0.5 * (yp[2:, :] - yp[:-2, :])
    return gx, gy


def build_pyramid(img, levels):
    """List of (H/2^l, W/2^l) f32 images, level 0 = original."""
    pyr = [img.astype(jnp.float32)]
    for _ in range(levels - 1):
        pyr.append(gaussian_downsample(pyr[-1]))
    return pyr
