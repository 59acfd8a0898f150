"""FAST-9/16 corner detection + NMS + grid top-k selection.

TPU-native redesign of the reference's per-level ``cv::FAST`` + recursive
quadtree distribution (``feature/orb_extractor_node``; SURVEY.md §7
"Quadtree -> grid top-k"):

* The segment test runs as a dense vectorized program over the whole image
  (16 shifted views -> contiguous-arc test via a circular min window) — no
  scalar loops, pure VPU work.
* Non-max suppression is a 3x3 max window.
* Spatial uniformity (the quadtree's goal) comes from per-cell top-k on a
  fixed grid, then a global top-k by response.

Everything returns fixed-size arrays (capacity + validity mask).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# FAST circle of radius 3: 16 (dy, dx) offsets in circular order
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)
_ARC = 9  # FAST-9/16 (OpenCV default used by the reference)
_BORDER = 3


def _shifted(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """View of img shifted so out[y,x] = img[y+dy, x+dx] (edge padded)."""
    return jnp.roll(img, (-dy, -dx), axis=(0, 1))


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """(H,W) f32 -> (H,W) f32 corner response (0 where not a corner).

    Score = max over (bright, dark) of the arc-sum of |p_i - p| - t over the
    qualifying contiguous arc (an OpenCV-style response, used only for NMS
    and ranking so exact equality with cv2 is not required).
    """
    p = img
    t = jnp.float32(threshold)
    ring = jnp.stack([_shifted(img, dy, dx) for dy, dx in _CIRCLE], axis=-1)  # (H,W,16)
    diff = ring - p[..., None]
    brighter = diff > t
    darker = diff < -t

    def arc_exists_and_score(flags, mag):
        # flags: (H,W,16) bool; contiguous run of >= _ARC in circular order.
        f = jnp.concatenate([flags, flags[..., : _ARC - 1]], axis=-1).astype(jnp.float32)
        m = jnp.concatenate([mag, mag[..., : _ARC - 1]], axis=-1)
        # windowed AND / SUM over length-_ARC windows via cumulative sums
        cf = jnp.cumsum(f, axis=-1)
        cf = jnp.concatenate([jnp.zeros_like(cf[..., :1]), cf], axis=-1)
        wf = cf[..., _ARC:] - cf[..., :-_ARC]          # (H,W,16) count in window
        cm = jnp.cumsum(m, axis=-1)
        cm = jnp.concatenate([jnp.zeros_like(cm[..., :1]), cm], axis=-1)
        wm = cm[..., _ARC:] - cm[..., :-_ARC]          # windowed magnitude sum
        ok = wf >= _ARC
        score = jnp.max(jnp.where(ok, wm, 0.0), axis=-1)
        return score

    bright_mag = jnp.maximum(diff - t, 0.0)
    dark_mag = jnp.maximum(-diff - t, 0.0)
    score = jnp.maximum(
        arc_exists_and_score(brighter, bright_mag),
        arc_exists_and_score(darker, dark_mag),
    )
    # zero the border (rolled wrap-around is invalid there)
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (yy >= _BORDER) & (yy < h - _BORDER) & (xx >= _BORDER) & (xx < w - _BORDER)
    )
    return jnp.where(inside, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep strict local maxima of a 3x3 neighborhood."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= mx, score, 0.0)


def detect_level(
    img: jnp.ndarray,
    ini_threshold: float,
    min_threshold: float,
    max_pts: int,
    cell: int = 32,
    mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect up to max_pts corners on one level.

    Mirrors the reference's two-threshold policy (FAST at ini_threshold,
    fallback to min_threshold in cells with no response) by computing both
    maps and preferring high-threshold responses via a score bonus.

    Returns (xy (max_pts,2) f32, response (max_pts,) f32, valid (max_pts,) bool).
    """
    s_hi = fast_score_map(img, ini_threshold)
    s_lo = fast_score_map(img, min_threshold)
    # prefer hi-threshold corners: they get a large additive bonus, lo-only
    # corners survive where no hi response exists (the reference's fallback).
    bonus = jnp.float32(1e4)
    score = jnp.where(s_hi > 0, s_hi + bonus, s_lo)
    score = nms3x3(score)
    if mask is not None:
        score = jnp.where(mask > 0, score, 0.0)

    h, w = img.shape
    gh, gw = -(-h // cell), -(-w // cell)
    ph, pw = gh * cell - h, gw * cell - w
    sp = jnp.pad(score, ((0, ph), (0, pw)))
    cells = sp.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    # per-cell cap: keep top-k per cell, zero the rest, then global top-k
    k_cell = max(1, min(cell * cell, (max_pts * 4) // (gh * gw) + 1))
    cv, ci = jax.lax.top_k(cells, k_cell)                 # (C, k_cell)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, cv.shape, 0)
    flat_idx = cell_ids * (cell * cell) + ci              # index into padded layout
    vals = cv.reshape(-1)
    idxs = flat_idx.reshape(-1)
    topv, topi = jax.lax.top_k(vals, max_pts)
    sel = idxs[topi]
    cy = sel // (cell * cell * gw)
    rem = sel % (cell * cell * gw)
    # careful: layout is (gh, gw, cell, cell) flattened as cells dim0=gh*gw
    cell_id = sel // (cell * cell)
    in_cell = sel % (cell * cell)
    gy, gx = cell_id // gw, cell_id % gw
    oy, ox = in_cell // cell, in_cell % cell
    y = gy * cell + oy
    x = gx * cell + ox
    del cy, rem
    valid = topv > 0
    resp = jnp.where(topv > bonus * 0.5, topv - bonus, topv)
    xy = jnp.stack([x, y], -1).astype(jnp.float32)
    return xy, resp, valid
