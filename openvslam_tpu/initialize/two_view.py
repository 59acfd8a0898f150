"""Two-view monocular bootstrap (ref ``initialize/{base,perspective,bearing_vector}``).

Pipeline (SURVEY.md §3.2 init path):
  1. area-gated descriptor match between the init frame and current frame
  2. H-RANSAC and F-RANSAC evaluated in parallel (batched hypotheses)
  3. model selection by score ratio R_H = S_H/(S_H+S_F) > 0.45 -> H else F
  4. decompose (8 Faugeras hypotheses for H / 4 for E), triangulate each,
     pick the hypothesis with dominant cheirality+parallax support
  5. return relative pose + triangulated points + inlier mask

For non-perspective cameras (fisheye/equirectangular) the bootstrap uses the
essential matrix on bearing vectors directly (ref initialize/bearing_vector).
Steps 1-4 are each one jitted program; the tiny selection logic is host-side.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import match as M
from ..ops import ransac, solvers, triangulate


class InitResult(NamedTuple):
    success: bool
    T_21: np.ndarray          # (4,4) pose of frame2 wrt frame1 (t normalized)
    points: np.ndarray        # (N,3) triangulated points in frame1 coords
    is_inlier: np.ndarray     # (N,) over the matched pairs
    idx1: np.ndarray          # (N,) keypoint indices in frame 1
    idx2: np.ndarray          # (N,) keypoint indices in frame 2
    used_homography: bool
    # descriptor matches between the views (failure diagnosis: the tracker
    # keeps its reference frame while overlap remains, ref mono initializer)
    num_matches: int = 0


@functools.partial(jax.jit, static_argnames=("radius",))
def match_for_init(desc1, valid1, xy1, desc2, valid2, xy2, radius=100.0):
    gate = M.window_gate(xy1, xy2, radius)
    idx, dist = M.match_descriptors(
        desc1, desc2, valid1, valid2, gate=gate,
        max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9, cross_check=True,
    )
    return idx, dist


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_h_and_f(key, p1, p2, mask, n_hyp=256):
    k1, k2 = jax.random.split(key)
    H, s_h, inl_h = ransac.run_ransac(
        k1,
        lambda i: solvers.fit_homography(p1[i], p2[i]),
        lambda H: solvers.score_homography(H, p1, p2, mask, sigma=1.0),
        mask, n_hyp, 4,
    )
    F, s_f, inl_f = ransac.run_ransac(
        k2,
        lambda i: solvers.fit_fundamental(p1[i], p2[i]),
        lambda F: solvers.score_fundamental(F, p1, p2, mask, sigma=1.0),
        mask, n_hyp, 8,
    )
    return H, s_h, inl_h, F, s_f, inl_f


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def ransac_essential(key, b1, b2, mask, n_hyp=256):
    E, s_e, inl_e = ransac.run_ransac(
        key,
        lambda i: solvers.fit_essential(b1[i], b2[i]),
        lambda E: solvers.score_essential(E, b1, b2, mask),
        mask, n_hyp, 8,
    )
    return E, s_e, inl_e


@jax.jit
def evaluate_motion_hypotheses(Rs, ts, b1, b2, mask, min_parallax_cos=0.99995):
    """For each candidate (R,t): triangulate all pairs, count support.

    Rs (Q,3,3), ts (Q,3); returns (counts (Q,), points (Q,N,3), good (Q,N)).
    Support = positive depth in both views + parallax above threshold.
    """
    eye = jnp.eye(4, dtype=b1.dtype)

    def one(R, t):
        T2 = eye.at[:3, :3].set(R).at[:3, 3].set(t)
        X, ok = triangulate.triangulate_two_view(b1, b2, eye, T2)
        z1, z2, cospar = triangulate.depths_and_parallax(X, b1, b2, eye, T2)
        good = ok & mask & (z1 > 0) & (z2 > 0) & (cospar < min_parallax_cos) & (cospar > -1.0)
        # also reject points with absurd depth
        good = good & (z1 < 1e5) & (z2 < 1e5)
        return jnp.sum(good.astype(jnp.int32)), X, good

    counts, Xs, goods = jax.vmap(one)(Rs, ts)
    return counts, Xs, goods


@functools.partial(jax.jit, static_argnames=("n_hyp", "perspective"))
def init_attempt(key, d1, v1, xy1, ang1, und1, brg1,
                 d2, v2, xy2, ang2, und2, brg2, K,
                 n_hyp=256, perspective=True):
    """The ENTIRE two-view bootstrap attempt as ONE program: match ->
    angle filter -> in-program match compaction -> H+F (or bearing-E)
    RANSAC -> both decompositions -> cheirality/parallax evaluation ->
    best-hypothesis selection.  The per-frame unfused ladder cost 5-7
    device round trips per attempted frame — on remote-TPU links that
    dominated time-to-first-track.

    Returns (num_matches, use_h, counts (8,), T21 (4,4), X (cap,3),
    good (cap,), m1 (cap,), m2 (cap,), pmask (cap,)) — compacted so the
    first num_matches rows are the matched pairs in ascending frame-1
    keypoint order (exactly the host compaction it replaces).
    """
    gate = M.window_gate(xy1, xy2, 100.0)
    idx, dist = M.match_descriptors(
        d1, d2, v1, v2, gate=gate,
        max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9, cross_check=True,
    )
    idx = M.angle_consistency_filter(ang1, ang2, idx)
    matched = idx >= 0
    num_matches = jnp.sum(matched.astype(jnp.int32))
    # stable compaction: matched pairs first, ascending frame-1 index
    order = jnp.argsort(jnp.where(matched, 0, 1), stable=True)
    m1 = order
    pmask = matched[order]
    m2 = jnp.where(pmask, idx[order], 0)
    p1 = jnp.where(pmask[:, None], und1[m1], 0.0)
    p2 = jnp.where(pmask[:, None], und2[m2], 0.0)
    unit_z = jnp.array([0.0, 0.0, 1.0], und1.dtype)
    b1 = jnp.where(pmask[:, None], brg1[m1], unit_z)
    b2 = jnp.where(pmask[:, None], brg2[m2], unit_z)

    if perspective:
        k1, k2 = jax.random.split(key)
        H, s_h, inl_h = ransac.run_ransac(
            k1,
            lambda i: solvers.fit_homography(p1[i], p2[i]),
            lambda Hh: solvers.score_homography(Hh, p1, p2, pmask, sigma=1.0),
            pmask, n_hyp, 4,
        )
        F, s_f, inl_f = ransac.run_ransac(
            k2,
            lambda i: solvers.fit_fundamental(p1[i], p2[i]),
            lambda Ff: solvers.score_fundamental(Ff, p1, p2, pmask, sigma=1.0),
            pmask, n_hyp, 8,
        )
        use_h = s_h / jnp.maximum(s_h + s_f, 1e-9) > 0.45
        Rs_h, ts_h, _ = solvers.decompose_homography(H, K)
        E = solvers.essential_from_F(F, K, K)
        Rs_e, ts_e = solvers.decompose_essential(E)
        pad = jnp.tile(jnp.eye(3, dtype=Rs_e.dtype), (4, 1, 1))
        Rs_e = jnp.concatenate([Rs_e, pad], 0)
        ts_e = jnp.concatenate([ts_e, jnp.zeros((4, 3), ts_e.dtype)], 0)
        hyp_ok = jnp.where(use_h, jnp.ones(8, bool),
                           jnp.arange(8) < 4)
        Rs = jnp.where(use_h, Rs_h, Rs_e)
        ts = jnp.where(use_h, ts_h, ts_e)
        base_inl = jnp.where(use_h, inl_h, inl_f)
    else:
        E, s_e, base_inl = ransac.run_ransac(
            key,
            lambda i: solvers.fit_essential(b1[i], b2[i]),
            lambda Ee: solvers.score_essential(Ee, b1, b2, pmask),
            pmask, n_hyp, 8,
        )
        Rs, ts = solvers.decompose_essential(E)
        pad = jnp.tile(jnp.eye(3, dtype=Rs.dtype), (4, 1, 1))
        Rs = jnp.concatenate([Rs, pad], 0)
        ts = jnp.concatenate([ts, jnp.zeros((4, 3), ts.dtype)], 0)
        hyp_ok = jnp.arange(8) < 4
        use_h = jnp.asarray(False)

    eval_mask = pmask & base_inl
    counts, Xs, goods = evaluate_motion_hypotheses(Rs, ts, b1, b2, eval_mask)
    counts = jnp.where(hyp_ok, counts, -1)
    best = jnp.argmax(counts)
    T21 = jnp.eye(4, dtype=Rs.dtype).at[:3, :3].set(Rs[best]) \
        .at[:3, 3].set(ts[best])
    return (num_matches, use_h, counts, T21, Xs[best], goods[best],
            m1, m2, pmask, jnp.sum(eval_mask.astype(jnp.int32)))


def initialize_two_view(key, frame1, frame2, cam, min_matches=50,
                        min_triangulated=40) -> InitResult:
    """Host orchestration of the bootstrap (ONE device call via
    init_attempt; acceptance thresholds on host).  frame*: data.Frame."""
    is_perspective = getattr(cam, "model_name", "perspective") == "perspective"
    if is_perspective:
        K = np.array(
            [[float(cam.fx), 0, float(cam.cx)],
             [0, float(cam.fy), float(cam.cy)], [0, 0, 1]], np.float32)
    else:
        K = np.eye(3, dtype=np.float32)
    out = init_attempt(
        key,
        jnp.asarray(frame1.desc_i8), jnp.asarray(frame1.valid),
        jnp.asarray(frame1.xy), jnp.asarray(frame1.angle),
        jnp.asarray(frame1.xy_undist), jnp.asarray(frame1.bearing),
        jnp.asarray(frame2.desc_i8), jnp.asarray(frame2.valid),
        jnp.asarray(frame2.xy), jnp.asarray(frame2.angle),
        jnp.asarray(frame2.xy_undist), jnp.asarray(frame2.bearing),
        jnp.asarray(K), perspective=is_perspective,
    )
    (num_matches, use_h, counts, T21, X, good, m1, m2, pmask,
     n_inl) = jax.device_get(out)
    n = int(num_matches)
    use_h = bool(use_h)
    if n < min_matches:
        return InitResult(False, np.eye(4), np.zeros((0, 3)),
                          np.zeros(0, bool), np.zeros(0, np.int64),
                          np.zeros(0, np.int64), use_h, n)
    order = np.argsort(counts)[::-1]
    n_best = int(counts[order[0]])
    n_second = int(counts[order[1]]) if len(order) > 1 else 0
    n_inl = int(n_inl)
    if n_best < min_triangulated or n_best < 0.5 * n_inl or (
        n_second > 0.93 * n_best and len(order) > 1
    ):
        return InitResult(False, np.eye(4), np.zeros((0, 3)),
                          np.zeros(0, bool), np.zeros(0, np.int64),
                          np.zeros(0, np.int64), use_h, n)
    return InitResult(True, T21.astype(np.float32), X[:n], good[:n],
                      m1[:n].astype(np.int64), m2[:n].astype(np.int64),
                      use_h, n)


def _initialize_two_view_unfused(key, frame1, frame2, cam, min_matches=50,
                                 min_triangulated=40) -> InitResult:
    """The original multi-call ladder, kept as the behavioral oracle for
    tests (the fused init_attempt must make the same decisions)."""
    d1 = jnp.asarray(frame1.desc_i8)
    d2 = jnp.asarray(frame2.desc_i8)
    v1 = jnp.asarray(frame1.valid)
    v2 = jnp.asarray(frame2.valid)
    idx, dist = match_for_init(
        d1, v1, jnp.asarray(frame1.xy), d2, v2, jnp.asarray(frame2.xy)
    )
    # orientation-consistency filter (ref match::angle_checker)
    idx = M.angle_consistency_filter(
        jnp.asarray(frame1.angle), jnp.asarray(frame2.angle), idx
    )
    idx = np.asarray(idx)
    m1 = np.where(idx >= 0)[0]
    if len(m1) < min_matches:
        return InitResult(False, np.eye(4), np.zeros((0, 3)), np.zeros(0, bool),
                          np.zeros(0, np.int64), np.zeros(0, np.int64), False,
                          len(m1))
    m2 = idx[m1]

    # pad matched pairs to fixed capacity for the jitted solvers
    cap = frame1.capacity
    n = len(m1)
    p1 = np.zeros((cap, 2), np.float32)
    p2 = np.zeros((cap, 2), np.float32)
    b1 = np.zeros((cap, 3), np.float32)
    b2 = np.zeros((cap, 3), np.float32)
    b1[:, 2] = 1.0
    b2[:, 2] = 1.0
    pmask = np.zeros(cap, bool)
    p1[:n] = frame1.xy_undist[m1]
    p2[:n] = frame2.xy_undist[m2]
    b1[:n] = frame1.bearing[m1]
    b2[:n] = frame2.bearing[m2]
    pmask[:n] = True

    is_perspective = getattr(cam, "model_name", "perspective") == "perspective"
    b1j, b2j = jnp.asarray(b1), jnp.asarray(b2)
    maskj = jnp.asarray(pmask)

    if is_perspective:
        H, s_h, inl_h, F, s_f, inl_f = ransac_h_and_f(
            key, jnp.asarray(p1), jnp.asarray(p2), maskj
        )
        s_h_f = float(s_h)
        s_f_f = float(s_f)
        ratio = s_h_f / max(s_h_f + s_f_f, 1e-9)
        use_h = ratio > 0.45
        K = np.array(
            [[float(cam.fx), 0, float(cam.cx)], [0, float(cam.fy), float(cam.cy)], [0, 0, 1]],
            np.float32,
        )
        if use_h:
            Rs, ts, _ = solvers.decompose_homography(H, jnp.asarray(K))
            base_inl = np.asarray(inl_h)
        else:
            E = solvers.essential_from_F(F, jnp.asarray(K), jnp.asarray(K))
            Rs, ts = solvers.decompose_essential(E)
            base_inl = np.asarray(inl_f)
    else:
        E, s_e, inl_e = ransac_essential(key, b1j, b2j, maskj)
        Rs, ts = solvers.decompose_essential(E)
        base_inl = np.asarray(inl_e)
        use_h = False

    eval_mask = jnp.asarray(pmask & base_inl)
    counts, Xs, goods = evaluate_motion_hypotheses(Rs, ts, b1j, b2j, eval_mask)
    counts = np.asarray(counts)
    order = np.argsort(counts)[::-1]
    best = int(order[0])
    n_best = int(counts[best])
    n_second = int(counts[order[1]]) if len(order) > 1 else 0
    n_inl = int(eval_mask.sum())
    # acceptance: dominant hypothesis with enough support (ref thresholds)
    if n_best < min_triangulated or n_best < 0.5 * n_inl or (
        n_second > 0.93 * n_best and len(order) > 1
    ):
        return InitResult(False, np.eye(4), np.zeros((0, 3)), np.zeros(0, bool),
                          np.zeros(0, np.int64), np.zeros(0, np.int64), use_h,
                          len(m1))

    T21 = np.eye(4, dtype=np.float32)
    T21[:3, :3] = np.asarray(Rs[best])
    T21[:3, 3] = np.asarray(ts[best])
    X = np.asarray(Xs[best])[:n]
    good = np.asarray(goods[best])[:n]
    return InitResult(True, T21, X, good, m1, m2, use_h, len(m1))
