"""Batched linear triangulation (ref ``solve/triangulator.*``).

Two-view DLT on bearing vectors: for bearing b and pose P = [R|t] (3x4,
world->cam), the constraint is hat(b) P X_h = 0 (2 independent rows).  We
stack 4 rows (2 per view) and take the smallest right singular vector of the
4x4 system — batched over N correspondences via eigh of A^T A.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3
from .precision import geometry_precision

_EPS = 1e-9


@geometry_precision
def triangulate_two_view(b1, b2, T1_cw, T2_cw):
    """b1, b2: (N,3) bearings; T*_cw: (4,4) poses. Returns (X_w (N,3), ok (N,))."""
    P1 = T1_cw[:3, :]  # (3,4)
    P2 = T2_cw[:3, :]
    # rows: b x (P X) = 0 -> use two rows of hat(b) P
    B1 = se3.hat(b1)  # (N,3,3)
    B2 = se3.hat(b2)
    A1 = B1 @ P1      # (N,3,4)
    A2 = B2 @ P2
    A = jnp.concatenate([A1[:, :2, :], A2[:, :2, :]], 1)  # (N,4,4)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, V = jnp.linalg.eigh(AtA)
    Xh = V[..., 0]                         # (N,4)
    wcomp = Xh[..., 3]
    ok = jnp.abs(wcomp) > _EPS
    X = Xh[..., :3] / jnp.where(ok, wcomp, 1.0)[..., None]
    return X, ok


@geometry_precision
def depths_and_parallax(X_w, b1, b2, T1_cw, T2_cw):
    """Cheirality/parallax helpers for triangulation gating.

    Returns (z1, z2, cos_parallax) where z = depth along the observed bearing
    in each camera (generalizes pinhole z>0 to all camera models).
    """
    x1 = X_w @ T1_cw[:3, :3].T + T1_cw[:3, 3]
    x2 = X_w @ T2_cw[:3, :3].T + T2_cw[:3, 3]
    z1 = jnp.sum(x1 * b1, -1)
    z2 = jnp.sum(x2 * b2, -1)
    c1 = -T1_cw[:3, :3].T @ T1_cw[:3, 3]
    c2 = -T2_cw[:3, :3].T @ T2_cw[:3, 3]
    r1 = X_w - c1
    r2 = X_w - c2
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), _EPS
    )
    return z1, z2, cos_par
