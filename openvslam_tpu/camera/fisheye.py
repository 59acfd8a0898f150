"""Fisheye camera, equidistant model with 4 coefficients (ref ``camera/fisheye.*``).

theta_d = theta (1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8); inversion by
fixed-iteration Newton (cv::fisheye::undistortPoints equivalent).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from .base import SetupType

_NEWTON_ITERS = 10


@flax.struct.dataclass
class Fisheye:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    k3: jnp.ndarray
    k4: jnp.ndarray
    cols: int = flax.struct.field(pytree_node=False)
    rows: int = flax.struct.field(pytree_node=False)
    fps: float = flax.struct.field(pytree_node=False)
    setup: SetupType = flax.struct.field(pytree_node=False)
    focal_x_baseline: float = flax.struct.field(pytree_node=False)
    depth_threshold: float = flax.struct.field(pytree_node=False)

    model_name = "fisheye"

    @classmethod
    def create(cls, fx, fy, cx, cy, k1=0.0, k2=0.0, k3=0.0, k4=0.0,
               cols=640, rows=480, fps=30.0, setup=SetupType.MONOCULAR,
               focal_x_baseline=0.0, depth_threshold=40.0):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(k3), f(k4),
                   int(cols), int(rows), float(fps), setup,
                   float(focal_x_baseline), float(depth_threshold))

    def _theta_d(self, theta):
        th2 = theta * theta
        return theta * (1.0 + th2 * (self.k1 + th2 * (self.k2 + th2 * (self.k3 + th2 * self.k4))))

    def _theta_from_theta_d(self, theta_d):
        th = theta_d
        for _ in range(_NEWTON_ITERS):
            th2 = th * th
            f = self._theta_d(th) - theta_d
            df = 1.0 + th2 * (3.0 * self.k1 + th2 * (5.0 * self.k2 + th2 * (7.0 * self.k3 + th2 * 9.0 * self.k4)))
            th = th - f / jnp.where(jnp.abs(df) < 1e-9, 1e-9, df)
        return th

    def keypoints_to_bearings(self, kpts):
        xd = (kpts[..., 0] - self.cx) / self.fx
        yd = (kpts[..., 1] - self.cy) / self.fy
        theta_d = jnp.sqrt(xd * xd + yd * yd)
        theta = self._theta_from_theta_d(theta_d)
        scale = jnp.where(theta_d > 1e-9, jnp.tan(theta) / jnp.maximum(theta_d, 1e-9), 1.0)
        x = xd * scale
        y = yd * scale
        v = jnp.stack([x, y, jnp.ones_like(x)], -1)
        # points behind the camera (theta > pi/2) keep direction via sign of cos
        v = jnp.where((jnp.cos(theta) < 0.0)[..., None], -v, v)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def undistort_keypoints(self, kpts):
        """Raw pixel -> undistorted (ideal pinhole) pixel with same K."""
        brg = self.keypoints_to_bearings(kpts)
        return self.bearings_to_keypoints(brg)

    def bearings_to_keypoints(self, brg):
        z = brg[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * brg[..., 0] / zs + self.cx
        v = self.fy * brg[..., 1] / zs + self.cy
        return jnp.stack([u, v], -1)

    def project_fisheye(self, pts_cam):
        """RAW distorted fisheye projection (rendering / visibility checks)."""
        x, y, z = pts_cam[..., 0], pts_cam[..., 1], pts_cam[..., 2]
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(r, z)
        theta_d = self._theta_d(theta)
        scale = jnp.where(r > 1e-9, theta_d / jnp.maximum(r, 1e-9), 0.0)
        u = self.fx * x * scale + self.cx
        v = self.fy * y * scale + self.cy
        uv = jnp.stack([u, v], -1)
        valid = (z > 0.0) & (u >= 0.0) & (u < self.cols) & (v >= 0.0) & (v < self.rows)
        return uv, z, valid

    def project(self, pts_cam):
        """Projection into the matching/residual space: *undistorted pinhole*
        pixels (consistent with ``undistort_keypoints``/``xy_undist``) —
        keeping every camera model's ``project`` in the same space its stored
        keypoints live in.  Visibility is checked in the RAW image (the real
        sensor bounds).  Note: undistorted-pinhole residuals limit the usable
        FOV to <180 degrees."""
        uv_raw, z, valid = self.project_fisheye(pts_cam)
        zs = jnp.where(jnp.abs(pts_cam[..., 2]) < 1e-9, 1e-9, pts_cam[..., 2])
        u = self.fx * pts_cam[..., 0] / zs + self.cx
        v = self.fy * pts_cam[..., 1] / zs + self.cy
        return jnp.stack([u, v], -1), z, valid

    def stereo_right_u(self, uv, depth):
        d = jnp.maximum(depth, 1e-9)
        return uv[..., 0] - self.focal_x_baseline / d
