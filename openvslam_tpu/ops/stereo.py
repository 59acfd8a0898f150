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
