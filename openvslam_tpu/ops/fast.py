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


def _arc_score(diff: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Segment-test score from the ring difference tensor (H,W,16).

    Score = max over (bright, dark) arcs of the windowed sum of |diff|-t over
    any contiguous run of >= _ARC ring pixels (OpenCV-style response; used for
    NMS/ranking only, exact cv2 equality not required)."""

    def arc(mag):
        # mag > 0 exactly where the pixel passes the threshold
        m = jnp.concatenate([mag, mag[..., : _ARC - 1]], axis=-1)
        f = (m > 0.0).astype(jnp.float32)
        cf = jnp.cumsum(f, axis=-1)
        cf = jnp.concatenate([jnp.zeros_like(cf[..., :1]), cf], axis=-1)
        wf = cf[..., _ARC:] - cf[..., :-_ARC]
        cm = jnp.cumsum(m, axis=-1)
        cm = jnp.concatenate([jnp.zeros_like(cm[..., :1]), cm], axis=-1)
        wm = cm[..., _ARC:] - cm[..., :-_ARC]
        return jnp.max(jnp.where(wf >= _ARC, wm, 0.0), axis=-1)

    bright = arc(jnp.maximum(diff - t, 0.0))
    dark = arc(jnp.maximum(-diff - t, 0.0))
    return jnp.maximum(bright, dark)


def fast_score_maps(img: jnp.ndarray, thresholds) -> list:
    """(H,W) f32 -> per-threshold (H,W) response maps, sharing the ring
    tensor (one set of shifts/diffs for all thresholds)."""
    ring = jnp.stack([_shifted(img, dy, dx) for dy, dx in _CIRCLE], axis=-1)
    diff = ring - img[..., None]
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (yy >= _BORDER) & (yy < h - _BORDER) & (xx >= _BORDER) & (xx < w - _BORDER)
    )
    return [
        jnp.where(inside, _arc_score(diff, jnp.float32(t)), 0.0) for t in thresholds
    ]


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Single-threshold convenience wrapper around fast_score_maps."""
    return fast_score_maps(img, [threshold])[0]


def topk_small(x: jnp.ndarray, k: int):
    """Per-row top-k as k rounds of (max, argmax, mask-out).

    Identical results to jax.lax.top_k (values descending; ties keep the
    lowest index, which argmax also picks) — but lax.top_k lowers to a full
    per-row variadic SORT custom call that costs ~55 us for one (300,1024)
    cell block on v5e (profiled: the 8 per-level calls were 284 us of the
    1.6 ms fused step).  k masked maxima are a few fused VPU reductions.
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        v = jnp.max(x, axis=-1)
        i = jnp.argmax(x, axis=-1).astype(jnp.int32)
        vals.append(v)
        idxs.append(i)
        x = jnp.where(cols == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def _use_pallas() -> bool:
    """Pallas band kernel on accelerators (validated exact vs XLA on the v5e
    backend, ~60x faster standalone); XLA everywhere else.  Opt out with
    OPENVSLAM_TPU_PALLAS_FAST=0."""
    import os

    if os.environ.get("OPENVSLAM_TPU_PALLAS_FAST", "") == "0":
        return False
    return jax.default_backend() != "cpu"


def _score_maps_hi_lo(img: jnp.ndarray, t_hi: float, t_lo: float):
    if _use_pallas():
        from .pallas.fast_kernel import fast_score_maps_pallas

        return fast_score_maps_pallas(img, float(t_hi), float(t_lo))
    return fast_score_maps(img, [t_hi, t_lo])


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
    s_hi, s_lo = _score_maps_hi_lo(img, ini_threshold, min_threshold)
    return select_from_scores(s_hi, s_lo, max_pts, cell=cell, mask=mask)


_BONUS = 1e4  # additive preference for hi-threshold corners (see below)


def _cell_candidates(
    s_hi: jnp.ndarray,
    s_lo: jnp.ndarray,
    max_pts: int,
    cell: int,
    mask: jnp.ndarray | None,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Per-cell candidate pool (the pre-top_k half of select_from_scores).

    Two-threshold preference + NMS + per-cell top-k cap.  Returns
    (vals (V,) f32 >= 0, idxs (V,) i32 into the padded (gh,gw,cell,cell)
    layout, gw) with V = num_cells * k_cell.
    """
    # prefer hi-threshold corners: they get a large additive bonus, lo-only
    # corners survive where no hi response exists (the reference's fallback).
    bonus = jnp.float32(_BONUS)
    score = jnp.where(s_hi > 0, s_hi + bonus, s_lo)
    score = nms3x3(score)
    if mask is not None:
        score = jnp.where(mask > 0, score, 0.0)

    h, w = score.shape
    gh, gw = -(-h // cell), -(-w // cell)
    ph, pw = gh * cell - h, gw * cell - w
    sp = jnp.pad(score, ((0, ph), (0, pw)))
    cells = sp.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    # per-cell cap: keep top-k per cell, zero the rest, then global top-k
    k_cell = max(1, min(cell * cell, (max_pts * 4) // (gh * gw) + 1))
    cv, ci = topk_small(cells, k_cell)                    # (C, k_cell)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, cv.shape, 0)
    flat_idx = cell_ids * (cell * cell) + ci              # index into padded layout
    return cv.reshape(-1), flat_idx.reshape(-1), gw


def _finalize_selection(topv: jnp.ndarray, sel: jnp.ndarray, gw: int, cell: int):
    """Decode top-k winners back to (xy, resp, valid) (the post-top_k half)."""
    # layout is (gh, gw, cell, cell) flattened as cells dim0=gh*gw
    cell_id = sel // (cell * cell)
    in_cell = sel % (cell * cell)
    gy, gx = cell_id // gw, cell_id % gw
    oy, ox = in_cell // cell, in_cell % cell
    y = gy * cell + oy
    x = gx * cell + ox
    valid = topv > 0
    bonus = jnp.float32(_BONUS)
    resp = jnp.where(topv > bonus * 0.5, topv - bonus, topv)
    xy = jnp.stack([x, y], -1).astype(jnp.float32)
    return xy, resp, valid


def select_from_scores(
    s_hi: jnp.ndarray,
    s_lo: jnp.ndarray,
    max_pts: int,
    cell: int = 32,
    mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-threshold preference + NMS + grid top-k from precomputed score
    maps (the post-detection half of detect_level; vmap-able over a leading
    batch axis for the multi-stream frontend)."""
    vals, idxs, gw = _cell_candidates(s_hi, s_lo, max_pts, cell, mask)
    topv, topi = jax.lax.top_k(vals, max_pts)
    sel = idxs[topi]
    return _finalize_selection(topv, sel, gw, cell)


def select_from_scores_multi(
    score_pairs,
    budgets,
    cell: int = 32,
    masks=None,
):
    """Cross-level selection: per-level candidate pools, then ONE batched
    ``lax.top_k`` over all levels instead of one sort custom call per level
    (8 small sorts were a measurable slice of the fused step's misc time).

    Per-level results are bit-identical to ``select_from_scores``: pools are
    padded to a common length with -inf (all real candidate values are
    >= 0, so pads can never displace one), stacked (L, Vmax), sorted once,
    and each level keeps its first ``budget`` winners — the same prefix the
    per-level sort returns, tie order included (pads sit at the tail).

    score_pairs: list of (s_hi, s_lo); budgets: list of int;
    masks: optional list of per-level masks (None entries allowed).
    Returns a list of (xy, resp, valid).
    """
    if masks is None:
        masks = [None] * len(score_pairs)
    vals_l, idxs_l, gws = [], [], []
    for (s_hi, s_lo), budget, mask in zip(score_pairs, budgets, masks):
        v, i, gw = _cell_candidates(s_hi, s_lo, budget, cell, mask)
        vals_l.append(v)
        idxs_l.append(i)
        gws.append(gw)
    vmax = max(v.shape[0] for v in vals_l)
    kmax = max(budgets)
    vals = jnp.stack([
        jnp.pad(v, (0, vmax - v.shape[0]), constant_values=-jnp.inf)
        for v in vals_l
    ])
    idxs = jnp.stack([jnp.pad(i, (0, vmax - i.shape[0])) for i in idxs_l])
    topv, topi = jax.lax.top_k(vals, kmax)               # ONE (L, Vmax) sort
    sel = jnp.take_along_axis(idxs, topi, axis=1)
    out = []
    for l, budget in enumerate(budgets):
        out.append(
            _finalize_selection(topv[l, :budget], sel[l, :budget], gws[l], cell)
        )
    return out


def _zero_border(s: jnp.ndarray, w_true: int, b: int = _BORDER) -> jnp.ndarray:
    """Zero a b-px frame of an (h, w_true) score map."""
    h = s.shape[0]
    yy = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    inside = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w_true - b)
    return jnp.where(inside, s, 0.0)


def detect_levels(
    level_imgs,
    ini_threshold: float,
    min_threshold: float,
    budgets,
    cell: int = 32,
    masks=None,
):
    """All-pyramid detection: per-level ``detect_level`` semantics with the
    cross-level launch structure a TPU wants.

    Two fusions over the naive 8x per-level loop (both bit-exact; validated
    in tests/test_pallas_fast.py / test_frontend.py):

    * **Grouped Pallas launches.** Levels whose lane-padded widths match are
      row-stacked (8-row aligned, like the multi-stream batch path) into one
      canvas per width class, so a 640x480/8-level pyramid runs 4 FAST
      kernel launches instead of 8 — identical padded-pixel work, fewer
      dispatches.  Seam safety: a score at level row r reads rows r+-3 and
      every level's 3-px border frame is re-zeroed after slicing, so no
      surviving score ever read a neighboring level's pixels (same argument
      as ``_score_maps_hi_lo_batch``).
    * **One batched top-k.** Per-level candidate pools go through a single
      (L, Vmax) ``lax.top_k`` instead of L small sort custom calls
      (``select_from_scores_multi``).

    Returns a list of (xy, resp, valid) per level.
    """
    n = len(level_imgs)
    if masks is None:
        masks = [None] * n
    if _use_pallas():
        from .pallas.fast_kernel import fast_score_maps_pallas

        # group consecutive levels by lane-padded width (pyramid widths
        # decrease monotonically, so equal padded widths are contiguous)
        pad_w = [((im.shape[1] + 127) // 128) * 128 for im in level_imgs]
        groups = []          # list of lists of level indices
        for l in range(n):
            if groups and pad_w[l] == pad_w[groups[-1][0]]:
                groups[-1].append(l)
            else:
                groups.append([l])
        score_pairs = [None] * n
        for g in groups:
            wc = pad_w[g[0]]
            hps = [((level_imgs[l].shape[0] + 7) // 8) * 8 for l in g]
            canvas = jnp.concatenate([
                jnp.pad(level_imgs[l],
                        ((0, hp - level_imgs[l].shape[0]),
                         (0, wc - level_imgs[l].shape[1])))
                for l, hp in zip(g, hps)
            ], axis=0)
            s_hi, s_lo = fast_score_maps_pallas(
                canvas, float(ini_threshold), float(min_threshold))
            off = 0
            for l, hp in zip(g, hps):
                h, w = level_imgs[l].shape
                score_pairs[l] = (
                    _zero_border(s_hi[off:off + h, :w], w),
                    _zero_border(s_lo[off:off + h, :w], w),
                )
                off += hp
    else:
        score_pairs = [
            tuple(fast_score_maps(im, [ini_threshold, min_threshold]))
            for im in level_imgs
        ]
    return select_from_scores_multi(score_pairs, budgets, cell=cell, masks=masks)


def _score_maps_hi_lo_batch(imgs: jnp.ndarray, t_hi: float, t_lo: float):
    """(B,H,W) -> two (B,H,W) score maps.

    Pallas path: the B frames are row-stacked (heights padded to the 8-row
    DMA alignment) into ONE tall image so the whole batch is a single kernel
    launch.  Correctness at frame seams: a score at row r reads rows r+-3,
    and select_from_scores zeroes the 3 border rows of every frame, so no
    surviving score ever reads a neighboring frame's pixels.  XLA path:
    vmap of the dense formulation.
    """
    b, h, w = imgs.shape
    if _use_pallas():
        from .pallas.fast_kernel import fast_score_maps_pallas

        hp = ((h + 7) // 8) * 8
        stacked = jnp.pad(imgs, ((0, 0), (0, hp - h), (0, 0)))
        stacked = stacked.reshape(b * hp, w)
        s_hi, s_lo = fast_score_maps_pallas(stacked, float(t_hi), float(t_lo))
        s_hi = s_hi.reshape(b, hp, w)[:, :h]
        s_lo = s_lo.reshape(b, hp, w)[:, :h]
        # re-zero per-frame borders (the kernel only zeroed the global ones)
        row = jnp.arange(h)[None, :, None]
        edge = (row >= _BORDER) & (row < h - _BORDER)
        return jnp.where(edge, s_hi, 0.0), jnp.where(edge, s_lo, 0.0)
    maps = jax.vmap(lambda im: fast_score_maps(im, [t_hi, t_lo]))(imgs)
    return maps[0], maps[1]


def detect_level_batch(
    imgs: jnp.ndarray,
    ini_threshold: float,
    min_threshold: float,
    max_pts: int,
    cell: int = 32,
    masks: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """detect_level over a batch of frames (B,H,W): one stacked Pallas
    launch for the score maps, vmapped selection.  Returns
    (xy (B,max_pts,2), response (B,max_pts), valid (B,max_pts))."""
    s_hi, s_lo = _score_maps_hi_lo_batch(imgs, ini_threshold, min_threshold)
    sel = functools.partial(select_from_scores, max_pts=max_pts, cell=cell)
    if masks is None:
        return jax.vmap(lambda a, b_: sel(a, b_))(s_hi, s_lo)
    return jax.vmap(lambda a, b_, m: sel(a, b_, mask=m))(s_hi, s_lo, masks)
