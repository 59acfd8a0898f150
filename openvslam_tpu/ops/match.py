"""Descriptor matching as MXU matmuls (ref ``match/*``; SURVEY.md §2.1 Matchers).

The reference's matchers are all "Hamming distance + some candidate gating"
(area window, BoW node, projected radius, epipolar).  On TPU we compute the
FULL N x M Hamming matrix with one int8 matmul — for binary a, b in {0,1}:

    hamming(a, b) = popcnt(a) + popcnt(b) - 2 a.b

— then apply each matcher's gating as an additive penalty before the top-2
reduction.  A 2048x2048x256 int8 matmul is ~1 GFLOP fused work: far cheaper
on the MXU than any gather-based candidate scheme, and it makes all the
matcher variants one kernel with different masks.

Distances are returned as int32 in [0, 256]; INVALID entries get LARGE.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

LARGE = jnp.int32(1 << 20)

# Acceptance thresholds.  The reference uses 50/100 for OpenCV's learned
# bit_pattern_31; our decorrelated synthetic-learned pattern (ops/orb.py) has
# tighter statistics (true matches median ~20, random pairs p02 ~ 36, measured
# in tools/make_brief_pattern.py conditions), so the gates are recalibrated.
HAMMING_DIST_THR_LOW = 30
HAMMING_DIST_THR_HIGH = 50
MAX_HAMMING_DIST = 256


def hamming_matrix(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """bits_*: (N,256)/(M,256) int8 in {0,1} -> (N,M) int32 Hamming distances."""
    dots = jax.lax.dot_general(
        bits_a, bits_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    na = jnp.sum(bits_a.astype(jnp.int32), -1)
    nb = jnp.sum(bits_b.astype(jnp.int32), -1)
    return na[:, None] + nb[None, :] - 2 * dots


def top2(dist: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row best & second-best: (best_idx (N,), best_d (N,), second_d (N,))."""
    neg = -dist
    v2, i2 = jax.lax.top_k(neg, 2)
    return i2[:, 0], -v2[:, 0], -v2[:, 1]


def match_descriptors(
    bits_a: jnp.ndarray,
    bits_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    gate: Optional[jnp.ndarray] = None,
    max_dist: int = HAMMING_DIST_THR_LOW,
    ratio: float = 0.9,
    cross_check: bool = True,
):
    """Generic gated matcher.

    gate: optional (N,M) bool — candidate compatibility (window / epipolar /
    projection radius / BoW-node equality), True = allowed.
    Returns (idx_b (N,) int32 [-1 if unmatched], dist (N,) int32).
    """
    d = hamming_matrix(bits_a, bits_b)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, LARGE)
    if gate is not None:
        d = jnp.where(gate, d, LARGE)
    best_idx, best_d, second_d = top2(d)
    ok = best_d <= max_dist
    if ratio is not None:
        ok &= best_d.astype(jnp.float32) <= ratio * second_d.astype(jnp.float32)
    if cross_check:
        # column-wise argmin must point back at the row
        col_best = jnp.argmin(d, axis=0)                  # (M,)
        ok &= col_best[best_idx] == jnp.arange(d.shape[0])
    return jnp.where(ok, best_idx, -1), jnp.where(ok, best_d, LARGE)


import functools


@functools.partial(jax.jit, static_argnames=("num_bins", "keep_top"))
def angle_consistency_filter(
    angles_a: jnp.ndarray, angles_b: jnp.ndarray, idx_b: jnp.ndarray,
    num_bins: int = 30, keep_top: int = 3,
):
    """Orientation-histogram check (ref ``match/angle_checker.h``): keep only
    matches whose angle difference falls in the top-`keep_top` histogram bins.

    Returns updated idx_b with inconsistent matches set to -1.
    """
    matched = idx_b >= 0
    da = angles_a - angles_b[jnp.clip(idx_b, 0)]
    da = jnp.mod(da, 2 * jnp.pi)
    bin_idx = jnp.clip((da / (2 * jnp.pi) * num_bins).astype(jnp.int32), 0, num_bins - 1)
    hist = jnp.zeros(num_bins, jnp.int32).at[bin_idx].add(matched.astype(jnp.int32))
    _, top_bins = jax.lax.top_k(hist, keep_top)
    in_top = (bin_idx[:, None] == top_bins[None, :]).any(-1)
    return jnp.where(matched & in_top, idx_b, -1)


def window_gate(xy_a: jnp.ndarray, xy_b: jnp.ndarray, radius: float) -> jnp.ndarray:
    """(N,2),(M,2) -> (N,M) bool: b within a square window around a (ref match::area)."""
    dx = jnp.abs(xy_a[:, None, 0] - xy_b[None, :, 0])
    dy = jnp.abs(xy_a[:, None, 1] - xy_b[None, :, 1])
    return (dx < radius) & (dy < radius)


def projection_gate(
    proj_uv: jnp.ndarray, proj_valid: jnp.ndarray, xy_b: jnp.ndarray,
    radius: jnp.ndarray,
) -> jnp.ndarray:
    """Guided 3D->2D search gate (ref match::projection): keypoint b must lie
    within `radius` (per-row scalar or (N,)) of the projected position."""
    r = radius if jnp.ndim(radius) > 0 else jnp.full(proj_uv.shape[0], radius)
    dx = proj_uv[:, None, 0] - xy_b[None, :, 0]
    dy = proj_uv[:, None, 1] - xy_b[None, :, 1]
    d2 = dx * dx + dy * dy
    return proj_valid[:, None] & (d2 < (r[:, None] ** 2))


def scale_gate(level_a: jnp.ndarray, level_b: jnp.ndarray, tol: int = 1) -> jnp.ndarray:
    """Octave-consistency gate: |level difference| <= tol."""
    return jnp.abs(level_a[:, None] - level_b[None, :]) <= tol


def _use_pallas_match() -> bool:
    """Fused Pallas projection matcher on accelerators (exact vs the XLA
    composition, tests/test_pallas_match.py); XLA everywhere else.  Opt out
    with OPENVSLAM_TPU_PALLAS_MATCH=0."""
    import os

    if os.environ.get("OPENVSLAM_TPU_PALLAS_MATCH", "") == "0":
        return False
    return jax.default_backend() != "cpu"


def projection_scale_match(
    a_desc_i8, b_desc_i8, uv, vis, radius, pred_level,
    b_xy, b_level, b_valid,
    max_dist: int = HAMMING_DIST_THR_HIGH,
    ratio=None, cross_check: bool = True, use_pallas: bool | None = None,
):
    """Projection-radius + octave gated matcher — THE guided-search matcher of
    the tracking/fuse hot path (ref match::projection, match::fuse).

    Dispatches to the fused Pallas kernel on accelerator backends (one VMEM
    pass instead of ~10 HBM passes over the (L,K) intermediates); falls back
    to the XLA gate+match composition on CPU.  Both paths are bit-identical.

    uv/vis: projected landmark pixel positions and their validity (already
    ANDed with landmark validity).  pred_level < 0 disables the octave gate
    for that row.  Returns (idx_b (L,) int32 [-1 unmatched], dist (L,)).
    use_pallas=False forces the XLA composition (e.g. under vmap, where a
    pallas_call with scalar-prefetch operands cannot be batched).
    """
    if _use_pallas_match() if use_pallas is None else use_pallas:
        from .pallas.match_kernel import projection_match_pallas

        return projection_match_pallas(
            a_desc_i8, b_desc_i8, uv, vis, radius, pred_level,
            b_xy, b_level, b_valid,
            max_dist=max_dist, ratio=ratio, cross_check=cross_check,
        )
    gate = projection_gate(uv, vis, b_xy, radius)
    sgate = jnp.abs(b_level[None, :] - pred_level[:, None]) <= 1
    gate = gate & (sgate | (pred_level < 0)[:, None])
    return match_descriptors(
        a_desc_i8, b_desc_i8, vis, b_valid, gate=gate,
        max_dist=max_dist, ratio=ratio, cross_check=cross_check,
    )


def epipolar_gate(
    bearings_a: jnp.ndarray, bearings_b: jnp.ndarray, E_ab: jnp.ndarray,
    thr: float = 2e-3,
) -> jnp.ndarray:
    """Essential-matrix consistency |b_a^T E b_b| below threshold on the unit
    sphere (ref match::robust's epipolar check for triangulation pairs)."""
    Eb = bearings_b @ E_ab.T                 # (M,3)
    n = Eb / jnp.maximum(jnp.linalg.norm(Eb, axis=-1, keepdims=True), 1e-9)
    res = jnp.abs(bearings_a @ n.T)          # (N,M)
    return res < thr
