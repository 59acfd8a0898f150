"""Equirectangular (360) camera (ref ``camera/equirectangular.*``).

u in [0, cols) maps to longitude [-pi, pi); v in [0, rows) to latitude
[-pi/2, pi/2).  Every bearing is valid (full sphere), so `project` only
checks image bounds after wrapping.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from .base import SetupType


@flax.struct.dataclass
class Equirectangular:
    cols: int = flax.struct.field(pytree_node=False)
    rows: int = flax.struct.field(pytree_node=False)
    fps: float = flax.struct.field(pytree_node=False)
    setup: SetupType = flax.struct.field(pytree_node=False)
    focal_x_baseline: float = flax.struct.field(pytree_node=False)
    depth_threshold: float = flax.struct.field(pytree_node=False)

    model_name = "equirectangular"

    @classmethod
    def create(cls, cols=1920, rows=960, fps=30.0):
        return cls(int(cols), int(rows), float(fps), SetupType.MONOCULAR, 0.0, 40.0)

    def undistort_keypoints(self, kpts):
        return kpts

    def keypoints_to_bearings(self, kpts):
        lon = (kpts[..., 0] / self.cols - 0.5) * (2.0 * jnp.pi)
        lat = -(kpts[..., 1] / self.rows - 0.5) * jnp.pi
        x = jnp.cos(lat) * jnp.sin(lon)
        y = -jnp.sin(lat)
        z = jnp.cos(lat) * jnp.cos(lon)
        return jnp.stack([x, y, z], -1)

    def bearings_to_keypoints(self, brg):
        b = brg / jnp.linalg.norm(brg, axis=-1, keepdims=True)
        lat = -jnp.arcsin(jnp.clip(b[..., 1], -1.0, 1.0))
        lon = jnp.arctan2(b[..., 0], b[..., 2])
        u = self.cols * (0.5 + lon / (2.0 * jnp.pi))
        v = self.rows * (0.5 - lat / jnp.pi)
        return jnp.stack([u, v], -1)

    def project(self, pts_cam):
        depth = jnp.linalg.norm(pts_cam, axis=-1)
        uv = self.bearings_to_keypoints(pts_cam / jnp.maximum(depth, 1e-9)[..., None])
        valid = (
            (depth > 1e-9)
            & (uv[..., 0] >= 0.0) & (uv[..., 0] < self.cols)
            & (uv[..., 1] >= 0.0) & (uv[..., 1] < self.rows)
        )
        return uv, depth, valid

    def stereo_right_u(self, uv, depth):
        return jnp.full_like(uv[..., 0], -1.0)
