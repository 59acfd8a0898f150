"""Pinhole camera with radial-tangential distortion (ref ``camera/perspective.*``).

Batched, jit-safe.  Undistortion is a fixed-iteration Newton/fixed-point
inversion (the reference calls cv::undistortPoints, itself iterative).
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from .base import SetupType

_UNDIST_ITERS = 10


@flax.struct.dataclass
class Perspective:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    cols: int = flax.struct.field(pytree_node=False)
    rows: int = flax.struct.field(pytree_node=False)
    fps: float = flax.struct.field(pytree_node=False)
    setup: SetupType = flax.struct.field(pytree_node=False)
    focal_x_baseline: float = flax.struct.field(pytree_node=False)
    depth_threshold: float = flax.struct.field(pytree_node=False)

    model_name = "perspective"

    @classmethod
    def create(cls, fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               cols=640, rows=480, fps=30.0, setup=SetupType.MONOCULAR,
               focal_x_baseline=0.0, depth_threshold=40.0):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2), f(k3),
                   int(cols), int(rows), float(fps), setup,
                   float(focal_x_baseline), float(depth_threshold))

    @property
    def has_distortion(self):
        return True

    def _distort_normalized(self, xy):
        """Apply radtan distortion to normalized coords (...,2)."""
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (self.k1 + r2 * (self.k2 + r2 * self.k3))
        xd = x * radial + 2.0 * self.p1 * x * y + self.p2 * (r2 + 2.0 * x * x)
        yd = y * radial + self.p1 * (r2 + 2.0 * y * y) + 2.0 * self.p2 * x * y
        return jnp.stack([xd, yd], -1)

    def _undistort_normalized(self, xyd):
        """Invert distortion by fixed-point iteration (...,2)."""
        xy = xyd
        for _ in range(_UNDIST_ITERS):
            d = self._distort_normalized(xy)
            xy = xy + (xyd - d)
        return xy

    def undistort_keypoints(self, kpts):
        """(...,2) pixel -> (...,2) undistorted pixel (same K)."""
        xn = (kpts[..., 0] - self.cx) / self.fx
        yn = (kpts[..., 1] - self.cy) / self.fy
        xy = self._undistort_normalized(jnp.stack([xn, yn], -1))
        u = xy[..., 0] * self.fx + self.cx
        v = xy[..., 1] * self.fy + self.cy
        return jnp.stack([u, v], -1)

    def keypoints_to_bearings(self, kpts):
        """(...,2) raw pixel -> (...,3) unit bearing."""
        xn = (kpts[..., 0] - self.cx) / self.fx
        yn = (kpts[..., 1] - self.cy) / self.fy
        xy = self._undistort_normalized(jnp.stack([xn, yn], -1))
        v = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def undistorted_to_bearings(self, kpts):
        """(...,2) *undistorted* pixel -> (...,3) unit bearing (no inversion)."""
        xn = (kpts[..., 0] - self.cx) / self.fx
        yn = (kpts[..., 1] - self.cy) / self.fy
        v = jnp.stack([xn, yn, jnp.ones_like(xn)], -1)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def bearings_to_keypoints(self, brg):
        """(...,3) bearing -> (...,2) undistorted pixel."""
        z = brg[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * brg[..., 0] / zs + self.cx
        v = self.fy * brg[..., 1] / zs + self.cy
        return jnp.stack([u, v], -1)

    def project(self, pts_cam):
        """(...,3) camera-frame points -> (uv(...,2), depth(...), valid(...)).

        uv is in *undistorted* pixel coordinates (the reference's reprojection
        also works in undistorted space for matching/optimization).
        """
        z = pts_cam[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * pts_cam[..., 0] / zs + self.cx
        v = self.fy * pts_cam[..., 1] / zs + self.cy
        uv = jnp.stack([u, v], -1)
        valid = (
            (z > 0.0)
            & (u >= 0.0) & (u < self.cols)
            & (v >= 0.0) & (v < self.rows)
        )
        return uv, z, valid

    def stereo_right_u(self, uv, depth):
        """Right-image u coordinate for a stereo/RGBD point (ref x_right)."""
        d = jnp.maximum(depth, 1e-9)
        return uv[..., 0] - self.focal_x_baseline / d
