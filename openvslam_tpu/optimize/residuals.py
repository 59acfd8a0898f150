"""Reprojection residuals + robust weights shared by all optimizers.

Replaces the reference's typed g2o edges (``optimize/internal/se3/*``,
``reproj_edge_wrapper`` dispatching on camera model; SURVEY.md §2.1).  Here
the "edge" is a pure function; Jacobians come from autodiff (jacfwd over the
6-DoF left-increment), batched with vmap — XLA fuses the whole edge batch
into a few dense ops.

Residual conventions (matching the reference's information weighting):
* mono: 2D pixel residual, chi2 threshold 5.991
* stereo: 3D (u, v, u_right) residual, chi2 threshold 7.815
* equirectangular: 2D pixel residual with horizontal seam wrapping
* per-observation variance sigma2 = scale_factor^(2*octave)
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..ops import se3

CHI2_2D = 5.991
CHI2_3D = 7.815
_EPS = 1e-9


def make_mono_residual(cam) -> Callable:
    """Returns residual(T_cw (4,4), X_w (3,), uv_obs (2,)) -> (r (2,), ok)."""
    is_equirect = getattr(cam, "model_name", "") == "equirectangular"

    def residual(T_cw, X_w, uv_obs):
        x_cam = se3.transform(T_cw, X_w)
        uv, depth, _ = cam.project(x_cam)
        r = uv_obs - uv
        if is_equirect:
            half = cam.cols * 0.5
            r = r.at[0].set(jnp.mod(r[0] + half, cam.cols) - half)
            ok = depth > _EPS
        else:
            ok = x_cam[2] > _EPS
        return jnp.where(ok, r, 0.0), ok

    return residual


def make_stereo_residual(cam) -> Callable:
    """Returns residual(T_cw, X_w, uvr_obs (3,)) -> (r (3,), ok).

    uvr_obs = (u, v, u_right); u_right = u - focal_x_baseline / depth.
    """

    def residual(T_cw, X_w, uvr_obs):
        x_cam = se3.transform(T_cw, X_w)
        uv, depth, _ = cam.project(x_cam)
        ur = cam.stereo_right_u(uv, depth)
        pred = jnp.concatenate([uv, ur[None]], 0)
        ok = x_cam[2] > _EPS
        r = uvr_obs - pred
        # a monocular observation inside a stereo frame carries u_right < 0:
        # mask its third component so mixed mono/stereo batches share one edge
        r = r.at[2].set(jnp.where(uvr_obs[2] < 0, 0.0, r[2]))
        return jnp.where(ok, r, 0.0), ok

    return residual


CAMV_DIM = 8   # per-observation camera vector: fx fy cx cy cols rows is_eq pad


def make_camv(spec: dict):
    """Serializable camera spec (camera.base.camera_to_config) -> (8,) f32
    vector for the multi-camera residual."""
    import numpy as np
    is_eq = 1.0 if spec.get("model") == "equirectangular" else 0.0
    return np.array([
        spec.get("fx", 0.0), spec.get("fy", 0.0),
        spec.get("cx", 0.0), spec.get("cy", 0.0),
        spec["cols"], spec["rows"], is_eq, 0.0,
    ], np.float32)


def make_multicam_mono_residual() -> Callable:
    """Residual with PER-OBSERVATION camera intrinsics, for bundle adjusting
    maps whose keyframes come from different cameras (ref: g2o edges carry
    their keyframe's camera; here the camera rides in the observation vector
    so one vmapped edge batch covers all models).

    obs layout (2+CAMV_DIM,): [u, v, fx, fy, cx, cy, cols, rows, is_eq, pad].
    Perspective/fisheye keyframes observe UNDISTORTED pixels -> pinhole
    projection; equirectangular ones use the lon/lat mapping with seam wrap.
    """

    def residual(T_cw, X_w, obs):
        uv_obs = obs[:2]
        fx, fy, cx, cy, cols, rows, is_eq = obs[2:9]
        x = se3.transform(T_cw, X_w)
        # pinhole branch
        z_safe = jnp.where(x[2] > _EPS, x[2], 1.0)
        uv_pin = jnp.stack([fx * x[0] / z_safe + cx, fy * x[1] / z_safe + cy])
        ok_pin = x[2] > _EPS
        # equirect branch
        depth = jnp.linalg.norm(x)
        b = x / jnp.maximum(depth, _EPS)
        lat = -jnp.arcsin(jnp.clip(b[1], -1.0, 1.0))
        lon = jnp.arctan2(b[0], b[2])
        uv_eq = jnp.stack([cols * (0.5 + lon / (2.0 * jnp.pi)),
                           rows * (0.5 - lat / jnp.pi)])
        ok_eq = depth > _EPS
        eq = is_eq > 0.5
        uv = jnp.where(eq, uv_eq, uv_pin)
        ok = jnp.where(eq, ok_eq, ok_pin)
        r = uv_obs - uv
        half = cols * 0.5
        r = r.at[0].set(jnp.where(eq, jnp.mod(r[0] + half, cols) - half, r[0]))
        return jnp.where(ok, r, 0.0), ok

    return residual


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel at squared error chi2 (threshold^2=delta2)."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, _EPS)))


def perturb_pose(xi: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplied increment: T' = exp(xi) T (the optimizers' chart)."""
    return se3.se3_exp(xi) @ T
