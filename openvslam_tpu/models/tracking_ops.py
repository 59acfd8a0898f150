"""Jitted device helpers for the tracking & mapping modules.

Each function is one fused XLA program over fixed-capacity arrays — the
tracking hot loop does a handful of these calls per frame (SURVEY.md §3.2
HOT-2/3 are the pose optimizer and the projection matcher below).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import match as M
from ..ops import se3, triangulate


@jax.jit
def project_landmarks(cam, T_cw, lm_pos, lm_valid):
    """Project landmark positions into a camera: (uv (L,2), depth, visible)."""
    pc = se3.transform(T_cw, lm_pos)
    uv, depth, valid = cam.project(pc)
    return uv, depth, valid & lm_valid


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def match_landmarks_by_projection(
    cam, T_cw, lm_pos, lm_desc_i8, lm_valid,
    kpt_desc_i8, kpt_xy_undist, kpt_valid, kpt_level,
    radius_scale, scale_factors, lm_pred_level,
    max_dist=M.HAMMING_DIST_THR_HIGH, ratio=None,
):
    """Guided 3D->2D search (ref match::projection): project landmarks, gate
    keypoints by radius (scaled by predicted octave) and octave consistency,
    Hamming-match on the MXU.

    radius_scale: base radius in px (scaled by the landmark's predicted level)
    lm_pred_level: (L,) predicted octave per landmark (-1 -> no scale gate)
    Returns (kpt_idx (L,), dist (L,)), -1 where unmatched.
    """
    uv, depth, vis = project_landmarks(cam, T_cw, lm_pos, lm_valid)
    lvl = jnp.clip(lm_pred_level, 0, scale_factors.shape[0] - 1)
    radius = radius_scale * scale_factors[lvl]
    idx, dist = M.projection_scale_match(
        lm_desc_i8, kpt_desc_i8, uv, vis, radius, lm_pred_level,
        kpt_xy_undist, kpt_level, kpt_valid,
        max_dist=max_dist, ratio=ratio, cross_check=True,
    )
    return idx, dist, vis


@jax.jit
def predict_scale_levels(lm_pos, T_cw, lm_max_dist, num_levels_arr, log_scale):
    """Predicted pyramid level from distance (ref landmark::predict_scale_level)."""
    cam_center = -(T_cw[:3, :3].T @ T_cw[:3, 3])
    dist = jnp.linalg.norm(lm_pos - cam_center, axis=-1)
    ratio = jnp.maximum(lm_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale)
    return jnp.clip(lvl, 0, num_levels_arr - 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def match_unmatched_robust(
    descA, validA, bearA, descB, validB, bearB, E_ab, epi_thr,
    max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9,
):
    """Epipolar-gated brute-force match between unmatched keypoints of two
    keyframes (ref match::robust for triangulation pairs)."""
    gate = M.epipolar_gate(bearA, bearB, E_ab, thr=epi_thr)
    idx, dist = M.match_descriptors(
        descA, descB, validA, validB, gate=gate,
        max_dist=max_dist, ratio=ratio, cross_check=True,
    )
    return idx, dist


@jax.jit
def triangulation_candidates_multi(
    cam, T1, desc1, un1, brg1, ang1, und1, sig1,
    T2s, desc2s, un2s, brg2s, ang2s, und2s, sig2s, epi_thr,
):
    """Robust match + orientation check + checked triangulation against B
    neighbor keyframes in ONE device call (the mapping module's
    create_new_landmarks loop was ~6 round-trips per covisible neighbor).

    Query-side operands are (K,...); neighbor-side carry a leading (B,...)
    axis (pad with un2s=False rows).  Neighbor operands may also be TUPLES
    of B (K,...) arrays — they are stacked INSIDE the program, so
    device-resident per-keyframe caches (mapping module) reach this call
    with zero host->device copies and one dispatch.  Returns (idx (B,K)
    matched neighbor kpt per query kpt, X (B,K,3) triangulated world points
    aligned to query keypoint slots, ok (B,K) acceptance).
    """
    if isinstance(desc2s, (tuple, list)):
        desc2s = jnp.stack(desc2s)
    if isinstance(brg2s, (tuple, list)):
        brg2s = jnp.stack(brg2s)
    if isinstance(ang2s, (tuple, list)):
        ang2s = jnp.stack(ang2s)
    if isinstance(und2s, (tuple, list)):
        und2s = jnp.stack(und2s)
    if isinstance(sig2s, (tuple, list)):
        sig2s = jnp.stack(sig2s)

    def one(T2, d2, u2, b2, a2, uu2, s2):
        E12 = essential_from_poses(T1, T2)
        idx, dist = match_unmatched_robust(
            desc1, un1, brg1, d2, u2, b2, E12, epi_thr)
        idx = M.angle_consistency_filter(ang1, a2, idx)
        kpt = jnp.clip(idx, 0)
        X, ok = triangulate_pair_checked(
            cam, T1, T2, brg1, b2[kpt], und1, uu2[kpt],
            sig1, s2[kpt], idx >= 0,
        )
        return idx, X, ok

    return jax.vmap(one)(T2s, desc2s, un2s, brg2s, ang2s, und2s, sig2s)


@jax.jit
def essential_from_poses(T1_cw, T2_cw):
    """E_12 with b1^T E b2 = 0 for bearings of cameras 1,2 (rel pose 1<-2)."""
    T12 = T1_cw @ se3.inverse(T2_cw)
    R = T12[:3, :3]
    t = T12[:3, 3]
    return se3.hat(t) @ R


@jax.jit
def triangulate_pair_checked(
    cam, T1_cw, T2_cw, b1, b2, uv1, uv2, sigma2_1, sigma2_2, mask,
    min_parallax_cos=0.99998, chi2=5.991,
):
    """Two-view triangulation with the reference's acceptance gates
    (ref module/two_view_triangulator): parallax, reprojection chi2 in both
    views, positive depth.  Returns (X_w (N,3), ok (N,))."""
    X, ok0 = triangulate.triangulate_two_view(b1, b2, T1_cw, T2_cw)
    z1, z2, cospar = triangulate.depths_and_parallax(X, b1, b2, T1_cw, T2_cw)
    uv1p, _, _ = cam.project(se3.transform(T1_cw, X))
    uv2p, _, _ = cam.project(se3.transform(T2_cw, X))
    e1 = jnp.sum((uv1 - uv1p) ** 2, -1) / jnp.maximum(sigma2_1, 1e-12)
    e2 = jnp.sum((uv2 - uv2p) ** 2, -1) / jnp.maximum(sigma2_2, 1e-12)
    ok = (
        ok0 & mask & (z1 > 1e-6) & (z2 > 1e-6)
        & (cospar < min_parallax_cos) & (cospar > 0.0)
        & (e1 < chi2) & (e2 < chi2)
    )
    return X, ok


@functools.partial(jax.jit, static_argnames=("max_dist",))
def fuse_candidates_multi(
    cam, T_cw_nb, lm_pos, lm_desc_i8, lm_valid,
    kpt_desc_i8, kpt_xy_undist, kpt_valid, kpt_level,
    radius_scale, scale_factors, lm_pred_level,
    max_dist=M.HAMMING_DIST_THR_LOW,
):
    """fuse_candidates against B neighbor keyframes in ONE device call.

    T_cw_nb (B,4,4); kpt_* carry a leading neighbor axis (B,K,...); the
    landmark table is shared.  Returns (idx (B,L), dist (B,L)).  Padding
    neighbors ride with kpt_valid=False and produce idx=-1 rows.

    The mapping module's per-neighbor loop was ~2 device round-trips per
    covisible target (10-20 per keyframe insertion — each an RTT on a
    remote-TPU deployment); this is one dispatch + one download.  Uses the
    XLA matcher composition (vmap over the Pallas matcher's ANY/blocked
    operands is not supported by Mosaic).  kpt_desc_i8 / kpt_xy_undist may
    be tuples of B per-keyframe arrays (stacked in-program; see
    triangulation_candidates_multi).
    """
    if isinstance(kpt_desc_i8, (tuple, list)):
        kpt_desc_i8 = jnp.stack(kpt_desc_i8)
    if isinstance(kpt_xy_undist, (tuple, list)):
        kpt_xy_undist = jnp.stack(kpt_xy_undist)

    def one(T_cw, desc, und, kvalid, klevel):
        uv, depth, vis = project_landmarks(cam, T_cw, lm_pos, lm_valid)
        lvl = jnp.clip(lm_pred_level, 0, scale_factors.shape[0] - 1)
        radius = radius_scale * scale_factors[lvl]
        gate = M.projection_gate(uv, vis, und, radius)
        sgate = jnp.abs(klevel[None, :] - lm_pred_level[:, None]) <= 1
        gate = gate & (sgate | (lm_pred_level < 0)[:, None])
        return M.match_descriptors(
            lm_desc_i8, desc, vis, kvalid, gate=gate,
            max_dist=max_dist, ratio=None, cross_check=False,
        )

    return jax.vmap(one)(T_cw_nb, kpt_desc_i8, kpt_xy_undist,
                         kpt_valid, kpt_level)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def fuse_candidates(
    cam, T_cw, lm_pos, lm_desc_i8, lm_valid,
    kpt_desc_i8, kpt_xy_undist, kpt_valid, kpt_level,
    radius_scale, scale_factors, lm_pred_level, max_dist=M.HAMMING_DIST_THR_LOW,
):
    """Project landmarks into a keyframe and find merge targets
    (ref match::fuse).  Same machinery as projection matching but without the
    ratio test (fusing wants the absolute best under a tight threshold)."""
    uv, depth, vis = project_landmarks(cam, T_cw, lm_pos, lm_valid)
    lvl = jnp.clip(lm_pred_level, 0, scale_factors.shape[0] - 1)
    radius = radius_scale * scale_factors[lvl]
    idx, dist = M.projection_scale_match(
        lm_desc_i8, kpt_desc_i8, uv, vis, radius, lm_pred_level,
        kpt_xy_undist, kpt_level, kpt_valid,
        max_dist=max_dist, ratio=None, cross_check=False,
    )
    return idx, dist
