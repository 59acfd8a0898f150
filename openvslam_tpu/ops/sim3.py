"""Sim(3) operations for loop closure / pose-graph optimization.

Replaces the reference's g2o Sim3 types (``optimize/internal/sim3/*`` and
``util/converter`` SE3<->Sim3; SURVEY.md §2.1).  A Sim3 element is the tuple
``(R, t, s)``; the tangent is a 7-vector ``[omega(3), upsilon(3), sigma]``
with ``s = exp(sigma)``.  Everything broadcasts over leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-7


def identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    t = jnp.zeros(batch_shape + (3,), dtype)
    s = jnp.ones(batch_shape, dtype)
    return R, t, s


def from_se3(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3], jnp.ones(T.shape[:-2], T.dtype)


def to_se3(R, t, s):
    """Drop scale onto translation: T = [R, t/s] (the reference's Sim3->SE3 rescale)."""
    return se3.from_Rt(R, t / s[..., None])


def compose(a, b):
    """(Ra,ta,sa) . (Rb,tb,sb): x -> sa*Ra*(sb*Rb*x + tb) + ta."""
    Ra, ta, sa = a
    Rb, tb, sb = b
    R = Ra @ Rb
    t = sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta
    s = sa * sb
    return R, t, s


def inverse(g):
    R, t, s = g
    Rt = jnp.swapaxes(R, -1, -2)
    si = 1.0 / s
    ti = -si[..., None] * (Rt @ t[..., None])[..., 0]
    return Rt, ti, si


def transform(g, pts):
    """Apply Sim3 to points (...,N,3) or (...,3)."""
    R, t, s = g
    if pts.ndim >= 2 and pts.shape[-2] != 3:
        return s[..., None, None] * (pts @ jnp.swapaxes(R, -1, -2)) + t[..., None, :]
    return s[..., None] * (R @ pts[..., None])[..., 0] + t


def _W_coeffs(theta, sigma, dtype):
    """Coefficients (A, B, C) of W = A I + B hat(w) + C hat(w)^2 where
    W = integral_0^1 exp(sigma u) exp(hat(w) u) du  (exact closed form with
    series fallbacks in the small-theta / small-sigma regimes)."""
    s = jnp.exp(sigma)
    th2 = theta * theta
    sg2 = sigma * sigma
    den = jnp.maximum(sg2 + th2, _EPS)
    small_th = theta < 1e-4
    small_sg = jnp.abs(sigma) < 1e-4

    # A = (s - 1)/sigma
    A = jnp.where(
        small_sg,
        1.0 + sigma / 2.0 + sg2 / 6.0,
        (s - 1.0) / jnp.where(small_sg, 1.0, sigma),
    )

    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    # I_sin = int e^{sigma u} sin(theta u) du ; I_cos = int e^{sigma u} cos(theta u) du
    I_sin = (s * (sigma * sin_t - theta * cos_t) + theta) / den
    I_cos = (s * (sigma * cos_t + theta * sin_t) - sigma) / den

    safe_th = jnp.maximum(theta, _EPS)
    B_generic = I_sin / safe_th
    C_generic = (A - I_cos) / jnp.maximum(th2, _EPS)

    # theta -> 0 limits (exact in sigma)
    safe_sg2 = jnp.where(small_sg, 1.0, sg2)
    B_th0 = jnp.where(small_sg, 0.5 + sigma / 3.0 + sg2 / 8.0, (s * (sigma - 1.0) + 1.0) / safe_sg2)
    safe_sg3 = jnp.where(small_sg, 1.0, sg2 * sigma)
    C_th0 = jnp.where(
        small_sg,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sg2 - sigma + 1.0) - 1.0) / safe_sg3,
    )

    B = jnp.where(small_th, B_th0, B_generic)
    C = jnp.where(small_th, C_th0, C_generic)
    return A.astype(dtype), B.astype(dtype), C.astype(dtype), s.astype(dtype)


def _W_matrix(w, sigma):
    theta = jnp.linalg.norm(w, axis=-1)
    A, B, C, s = _W_coeffs(theta, sigma, w.dtype)
    Wh = se3.hat(w)
    Wh2 = Wh @ Wh
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Wh.shape)
    return A[..., None, None] * eye + B[..., None, None] * Wh + C[..., None, None] * Wh2, s


def exp(xi: jnp.ndarray):
    """(...,7) [omega, upsilon, sigma] -> (R, t, s)."""
    w = xi[..., :3]
    u = xi[..., 3:6]
    sigma = xi[..., 6]
    R = se3.so3_exp(w)
    Wm, s = _W_matrix(w, sigma)
    t = (Wm @ u[..., None])[..., 0]
    return R, t, s


def log(g):
    """(R, t, s) -> (...,7) [omega, upsilon, sigma]."""
    R, t, s = g
    w = se3.so3_log(R)
    sigma = jnp.log(s)
    Wm, _ = _W_matrix(w, sigma)
    u = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([w, u, sigma[..., None]], -1)
