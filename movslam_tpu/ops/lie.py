"""SO(3)/SE(3) Lie-group operations in JAX (f32, batched, jit-friendly).

TPU-native replacement for the reference's Sophus usage (e.g.
/root/reference/include/Frame.h SE3f poses, /root/reference/src/Converter.cc).
All functions are shape-polymorphic over leading batch dims via broadcasting
and are safe under vmap/jit (no data-dependent control flow).

Conventions:
  - Poses are camera-from-world transforms T_cw stored as (R, t) with
    R: (..., 3, 3), t: (..., 3). x_cam = R @ x_world + t.
  - Tangent vectors are 6-dim [rho (trans), phi (rot)] like Sophus/g2o se3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix of (...,3) vectors -> (...,3,3)."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(phi):
    """Rodrigues: (...,3) -> (...,3,3). Taylor-safe near 0."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    K2 = K @ K
    # sin(t)/t and (1-cos t)/t^2 with small-angle expansions
    a = jnp.where(theta2 > 1e-8, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > 1e-8, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R):
    """(...,3,3) -> (...,3). Stable for small angles; angle < pi assumed."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # theta/(2 sin theta); small-angle series 1/2 + theta^2/12 expressed in
    # (1 - cos) so the gradient is polynomial (theta^2 = 2(1-cos) + O(th^4)).
    # Both branches are evaluated under jacfwd/jacrev, so each must have a
    # finite gradient everywhere: arccos input is clipped strictly inside
    # (-1, 1) for the large branch (d/dx arccos blows up at +-1).
    near = cos_t > 1.0 - 1e-6
    cos_l = jnp.clip(cos_t, -1.0 + 1e-7, 1.0 - 1e-7)
    theta_l = jnp.arccos(cos_l)
    scale = jnp.where(
        near,
        0.5 + (1.0 - cos_t) / 6.0,
        theta_l / (2.0 * jnp.sin(theta_l)),
    )
    return w * scale[..., None]


def _so3_left_jacobian(phi):
    """V matrix used by se3_exp translation part."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    K2 = K @ K
    b = jnp.where(theta2 > 1e-8, (1.0 - jnp.cos(theta)) / theta2, 0.5 - theta2 / 24.0)
    c = jnp.where(
        theta2 > 1e-8, (theta - jnp.sin(theta)) / (theta2 * theta), 1.0 / 6.0 - theta2 / 120.0
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * K2


def se3_exp(xi):
    """(...,6) [rho, phi] -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R, t):
    """Inverse of se3_exp -> (...,6)."""
    phi = so3_log(R)
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    K = hat(phi)
    K2 = K @ K
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin/(2(1-cos))) K^2
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    coef = jnp.where(
        theta2 > 1e-8,
        (1.0 - (theta * sin_t) / (2.0 * (1.0 - cos_t + _EPS))) / (theta2 + _EPS),
        1.0 / 12.0 + theta2 / 720.0,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * K2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(a ∘ b): x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x):
    """Transform points x (...,3)."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def se3_matrix(R, t):
    """(R, t) -> (...,4,4) homogeneous."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def rotation_to_quaternion(R):
    """(...,3,3) -> quaternion (...,4) as (qx, qy, qz, qw), TUM/EuRoC order.

    Shepperd's method, branchless via selecting the max-trace variant.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate constructions; pick numerically best.
    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1)
    q1 = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    q2 = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    q3 = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1)

    scores = jnp.stack([1.0 + tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.select(
        [idx == 0, idx == 1, idx == 2, idx == 3],
        [q0, q1, q2, q3],
    )
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # canonical: qw >= 0
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def quaternion_to_rotation(q):
    """(qx,qy,qz,qw) (...,4) -> (...,3,3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def project_to_so3(M):
    """Nearest rotation matrix via SVD (det +1)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(M[..., :1, 0]), jnp.ones_like(M[..., :1, 0]), det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt
