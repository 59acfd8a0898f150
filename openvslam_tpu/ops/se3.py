"""SE(3) / SO(3) operations, batched and jit-safe.

Functional replacement for the reference's Eigen pose plumbing
(``util/converter.*`` SE3<->quaternion, ``Mat44_t cam_pose_cw`` in
``data/frame``; SURVEY.md §2.1).  Conventions follow the reference:

* Poses are camera<-world transforms ``T_cw`` stored as (4,4) row-major.
* ``exp``/``log`` use the [omega, upsilon] = [rotation, translation]
  tangent ordering with the standard left-jacobian V matrix.

Everything here broadcasts over arbitrary leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) skew-symmetric matrix."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    # Taylor-safe coefficients
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) rotation -> (...,3) axis-angle (principal value).

    Goes through the stable 4-branch quaternion conversion, which is accurate
    across the whole rotation group including theta ~ pi.
    """
    q = to_quat(R)                                  # (x, y, z, w)
    # principal value: force w >= 0
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    qv = q[..., :3]
    qw = q[..., 3]
    n = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(n, qw)
    small = n < 1e-7
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), theta / jnp.maximum(n, _EPS))
    return scale[..., None] * qv


def _V(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3): integrates translation in se(3) exp."""
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def _V_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, -1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    half = 0.5
    k = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - 0.5 * theta * jnp.cos(0.5 * theta) / jnp.maximum(jnp.sin(0.5 * theta), _EPS)) / theta2,
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - half * W + k[..., None, None] * W2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(...,6) twist [omega, upsilon] -> (...,4,4) transform."""
    w, u = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = (_V(w) @ u[..., None])[..., 0]
    T = jnp.zeros(xi.shape[:-1] + (4, 4), xi.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(...,4,4) -> (...,6) twist [omega, upsilon]."""
    w = so3_log(T[..., :3, :3])
    u = (_V_inv(w) @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([w, u], -1)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    Ti = jnp.zeros_like(T)
    Ti = Ti.at[..., :3, :3].set(Rt)
    Ti = Ti.at[..., :3, 3:].set(-(Rt @ t))
    Ti = Ti.at[..., 3, 3].set(1.0)
    return Ti


def transform(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (...,4,4) to points (...,N,3) or (...,3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim >= 2 and pts.shape[-2] != 3:
        return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return (R @ pts[..., None])[..., 0] + t


def from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    T = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,4) quaternion (x, y, z, w), TUM trajectory order."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q0 = jnp.stack([(m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0), qw0], -1)
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q1 = jnp.stack([qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1), (m21 - m12) / (4 * qx1)], -1)
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q2 = jnp.stack([(m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2), (m02 - m20) / (4 * qy2)], -1)
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q3 = jnp.stack([(m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3, (m10 - m01) / (4 * qz3)], -1)
    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], -1)
    idx = jnp.argmax(scores, -1)
    qs = jnp.stack([q0, q1, q2, q3], -2)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) quaternion (x, y, z, w) -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation via SVD (used after averaging / solving)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.ones(M.shape[:-2] + (3,), M.dtype).at[..., 2].set(det)
    return (U * D[..., None, :]) @ Vt
