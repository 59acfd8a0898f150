"""Stereo rectification (ref ``util/stereo_rectifier``): precompute
undistort+rectify remap grids from calibration (K, D, R_rect, P per camera)
and warp incoming images with one jitted bilinear remap — the cv::initUndistortRectifyMap
+ remap pair, TPU-native.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _distort_radtan(xy, D):
    k1, k2, p1, p2, k3 = D
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([xd, yd], -1)


def build_rectify_map(K, D, R_rect, P_new, rows, cols):
    """Source-pixel lookup map (rows, cols, 2) for the rectified image.

    For each rectified pixel: unproject with P_new, rotate by R_rect^-1,
    distort with (K, D) -> raw source pixel.
    """
    K = np.asarray(K, np.float64)
    R = np.asarray(R_rect, np.float64)
    P = np.asarray(P_new, np.float64)[:3, :3]
    uu, vv = np.meshgrid(np.arange(cols), np.arange(rows))
    xn = (uu - P[0, 2]) / P[0, 0]
    yn = (vv - P[1, 2]) / P[1, 1]
    rays = np.stack([xn, yn, np.ones_like(xn)], -1) @ np.linalg.inv(R).T
    rays = rays / rays[..., 2:]
    xyd = _distort_radtan(rays[..., :2], np.asarray(D, np.float64))
    u_src = xyd[..., 0] * K[0, 0] + K[0, 2]
    v_src = xyd[..., 1] * K[1, 1] + K[1, 2]
    return np.stack([u_src, v_src], -1).astype(np.float32)


@jax.jit
def remap_bilinear(img: jnp.ndarray, src_map: jnp.ndarray) -> jnp.ndarray:
    """img (H,W) u8/f32, src_map (H',W',2) -> (H',W') f32 (0 outside)."""
    im = img.astype(jnp.float32)
    h, w = im.shape
    x = src_map[..., 0]
    y = src_map[..., 1]
    inb = (x >= 0) & (x < w - 1) & (y >= 0) & (y < h - 1)
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    out = (
        im[y0, x0] * (1 - fx) * (1 - fy)
        + im[y0, x0 + 1] * fx * (1 - fy)
        + im[y0 + 1, x0] * (1 - fx) * fy
        + im[y0 + 1, x0 + 1] * fx * fy
    )
    return jnp.where(inb, out, 0.0)


class StereoRectifier:
    """Built from the reference YAML schema: StereoRectifier.K_left/D_left/
    R_left (and _right), with the rectified intrinsics from the Camera
    section."""

    def __init__(self, cam, raw_cfg):
        sr = raw_cfg.get("StereoRectifier", {})
        P = np.array([
            [float(cam.fx), 0, float(cam.cx)],
            [0, float(cam.fy), float(cam.cy)],
            [0, 0, 1],
        ])
        self.map_l = build_rectify_map(
            np.array(sr["K_left"]).reshape(3, 3), sr["D_left"],
            np.array(sr.get("R_left", np.eye(3).ravel().tolist())).reshape(3, 3),
            P, cam.rows, cam.cols,
        )
        self.map_r = build_rectify_map(
            np.array(sr["K_right"]).reshape(3, 3), sr["D_right"],
            np.array(sr.get("R_right", np.eye(3).ravel().tolist())).reshape(3, 3),
            P, cam.rows, cam.cols,
        )

    def rectify(self, left, right):
        l = remap_bilinear(jnp.asarray(left), jnp.asarray(self.map_l))
        r = remap_bilinear(jnp.asarray(right), jnp.asarray(self.map_r))
        return (np.asarray(l).astype(np.uint8), np.asarray(r).astype(np.uint8))
