"""Stereo keypoint matching on rectified pairs (ref ``match/stereo``).

The reference does row-wise SAD correlation with subpixel refinement over
FAST keypoints of the right image.  TPU-native version: both images run the
same ORB frontend; candidates are gated by row proximity and disparity range
and scored by descriptor Hamming distance on the MXU — one fused matcher
call, same acceptance semantics (best match per left keypoint within the
epipolar band).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import match as M


@functools.partial(jax.jit, static_argnames=("max_dist",))
def stereo_match(
    desc_l, xy_l, valid_l, level_l,
    desc_r, xy_r, valid_r, level_r,
    focal_x_baseline, min_disparity=0.5, max_disparity=1e4,
    row_tol=2.0, max_dist=M.HAMMING_DIST_THR_LOW,
):
    """Returns (x_right (K,), depth (K,)) per left keypoint; -1 if unmatched."""
    row_gate = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1]) <= row_tol
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    disp_gate = (disp >= min_disparity) & (disp <= max_disparity)
    scale_gate = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    gate = row_gate & disp_gate & scale_gate
    idx, dist = M.match_descriptors(
        desc_l, desc_r, valid_l, valid_r, gate=gate,
        max_dist=max_dist, ratio=0.95, cross_check=True,
    )
    matched = idx >= 0
    xr = jnp.where(matched, xy_r[jnp.clip(idx, 0), 0], -1.0)
    d = jnp.where(matched, xy_l[:, 0] - xr, -1.0)
    depth = jnp.where(matched & (d > 1e-6), focal_x_baseline / jnp.maximum(d, 1e-6), -1.0)
    # reject absurd depths
    ok = matched & (depth > 0)
    return jnp.where(ok, xr, -1.0), jnp.where(ok, depth, -1.0)


@functools.partial(jax.jit, static_argnames=("max_disp", "half_w", "half_h"))
def stereo_match_dense(
    img_l, img_r, xy, valid, focal_x_baseline,
    max_disp: int = 96, half_w: int = 5, half_h: int = 2,
    max_cost: float = 18.0, uniq_ratio: float = 0.88,
):
    """Dense epipolar correlation: match each LEFT keypoint against the
    right IMAGE by zero-mean SAD over an (2*half_h+1)x(2*half_w+1) patch at
    every integer disparity in [1, max_disp], with parabolic subpixel
    refinement — the reference's ``match::stereo`` SAD scheme
    (orb extractor corners + row-band SAD), batched (K, D, h, w) on device.

    Unlike descriptor matching against right-image FAST corners, this does
    not require the corner detector to fire at the same spot in both views,
    so nearly every left keypoint with in-range disparity gets a depth.

    Returns (x_right (K,), depth (K,)); -1 where unmatched.
    """
    H, W = img_l.shape
    il = img_l.astype(jnp.float32)
    ir = img_r.astype(jnp.float32)
    u = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
    dy = jnp.arange(-half_h, half_h + 1)
    dx = jnp.arange(-half_w, half_w + 1)
    rows = jnp.clip(v[:, None] + dy[None, :], 0, H - 1)        # (K,h)
    cols_l = jnp.clip(u[:, None] + dx[None, :], 0, W - 1)      # (K,w)
    patch_l = il[rows[:, :, None], cols_l[:, None, :]]         # (K,h,w)
    zl = patch_l - patch_l.mean(axis=(1, 2), keepdims=True)
    dvals = jnp.arange(1, max_disp + 1)                        # (D,)
    cols_r = u[:, None, None] - dvals[None, :, None] + dx[None, None, :]
    in_img = cols_r[:, :, 0] >= 0                              # (K,D)
    cols_rc = jnp.clip(cols_r, 0, W - 1)
    patch_r = ir[rows[:, None, :, None], cols_rc[:, :, None, :]]  # (K,D,h,w)
    zr = patch_r - patch_r.mean(axis=(2, 3), keepdims=True)
    cost = jnp.abs(zl[:, None] - zr).mean(axis=(2, 3))         # (K,D)
    cost = jnp.where(in_img, cost, jnp.inf)
    best = jnp.argmin(cost, axis=1)                            # (K,)
    K = xy.shape[0]
    ar = jnp.arange(K)
    c0 = cost[ar, best]
    # uniqueness: best must beat every disparity further than 1px away
    far = jnp.abs(dvals[None, :] - dvals[best][:, None]) > 1
    c2nd = jnp.min(jnp.where(far, cost, jnp.inf), axis=1)
    # parabola subpixel around the best integer disparity
    bl = jnp.clip(best - 1, 0, max_disp - 1)
    br = jnp.clip(best + 1, 0, max_disp - 1)
    cl_, cr_ = cost[ar, bl], cost[ar, br]
    denom = cl_ + cr_ - 2 * c0
    offs = jnp.where(
        (denom > 1e-6) & jnp.isfinite(cl_) & jnp.isfinite(cr_),
        jnp.clip(0.5 * (cl_ - cr_) / jnp.maximum(denom, 1e-6), -0.5, 0.5),
        0.0)
    disp = dvals[best].astype(jnp.float32) + offs
    ok = (
        valid
        & jnp.isfinite(c0) & (c0 <= max_cost)
        & (c0 <= uniq_ratio * c2nd)
        & (disp >= 1.0)
    )
    xr = jnp.where(ok, xy[:, 0] - disp, -1.0)
    depth = jnp.where(ok, focal_x_baseline / jnp.maximum(disp, 1e-6), -1.0)
    return xr, depth
