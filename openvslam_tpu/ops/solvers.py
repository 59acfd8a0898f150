"""Minimal-solver kit (ref ``solve/``: essential/fundamental/homography/pnp/sim3).

All functions are pure, jit-safe, and written to be ``vmap``-ed over RANSAC
hypotheses (see ``ops/ransac.py``).  Conventions:

* 2D keypoints are undistorted pixel coordinates (N,2).
* bearings are unit 3-vectors in the camera frame (N,3).
* Poses map world->camera: x_cam = R x_w + t.
* Masks select the valid prefix of fixed-capacity arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3
from .precision import geometry_precision

_EPS = 1e-9


# ---------------------------------------------------------------------------
# normalization helpers
# ---------------------------------------------------------------------------

@geometry_precision
def hartley_normalize(pts: jnp.ndarray, mask: jnp.ndarray):
    """Isotropic normalization of (N,2) points -> (T(3,3), pts_n(N,2))."""
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(pts * w[:, None], 0) / n
    d = jnp.sqrt(jnp.sum((pts - mean) ** 2, -1))
    mean_d = jnp.sum(d * w) / n
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, _EPS)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return T, (pts - mean) * s


def _smallest_right_singular(A: jnp.ndarray) -> jnp.ndarray:
    """Right singular vector of the smallest singular value of A (m,n)->(n,)."""
    # Use eigh of A^T A — symmetric, small n (<=9), robust and cheap on TPU.
    AtA = A.T @ A
    w, V = jnp.linalg.eigh(AtA)
    return V[:, 0]


# ---------------------------------------------------------------------------
# fundamental matrix (normalized 8-point) — ref solve/fundamental_solver
# ---------------------------------------------------------------------------

@geometry_precision
def fit_fundamental(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """8-point F from (k,2)+(k,2) undistorted pixels; returns (3,3), rank-2."""
    T1, p1n = hartley_normalize(p1, jnp.ones(p1.shape[0], bool))
    T2, p2n = hartley_normalize(p2, jnp.ones(p2.shape[0], bool))
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], -1)
    f = _smallest_right_singular(A)
    F = f.reshape(3, 3)
    # enforce rank 2
    U, S, Vt = jnp.linalg.svd(F)
    F = (U * S.at[2].set(0.0)[None, :]) @ Vt
    return T2.T @ F @ T1


@geometry_precision
def score_fundamental(F, p1, p2, mask, sigma: float = 1.0):
    """ORB-SLAM-style chi2 score: sum over inliers of (thr - chi2) both dirs."""
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], -1)
    h2 = jnp.concatenate([p2, ones], -1)
    Fx1 = h1 @ F.T           # epipolar lines in image 2
    Ftx2 = h2 @ F            # epipolar lines in image 1
    num = jnp.sum(h2 * Fx1, -1)
    d2_2 = num**2 / jnp.maximum(Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2, _EPS)
    d2_1 = num**2 / jnp.maximum(Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2, _EPS)
    inv_s2 = 1.0 / (sigma * sigma)
    chi1 = d2_1 * inv_s2
    chi2_ = d2_2 * inv_s2
    thr = 3.841
    thr_score = 5.991
    ok = (chi1 < thr) & (chi2_ < thr) & mask
    score = jnp.sum(
        jnp.where(ok, (thr_score - chi1) + (thr_score - chi2_), 0.0)
    )
    return score, ok


# ---------------------------------------------------------------------------
# homography (normalized DLT) — ref solve/homography_solver
# ---------------------------------------------------------------------------

@geometry_precision
def fit_homography(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """DLT H (p2 ~ H p1) from (k,2)+(k,2); k>=4."""
    T1, p1n = hartley_normalize(p1, jnp.ones(p1.shape[0], bool))
    T2, p2n = hartley_normalize(p2, jnp.ones(p2.shape[0], bool))
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    zero = jnp.zeros_like(x1)
    one = jnp.ones_like(x1)
    r1 = jnp.stack([zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], -1)
    r2 = jnp.stack([x1, y1, one, zero, zero, zero, -x2 * x1, -x2 * y1, -x2], -1)
    A = jnp.concatenate([r1, r2], 0)
    h = _smallest_right_singular(A)
    H = h.reshape(3, 3)
    Hn = jnp.linalg.solve(T2, H @ T1)
    return Hn / jnp.where(jnp.abs(Hn[2, 2]) < _EPS, _EPS, Hn[2, 2])


@geometry_precision
def score_homography(H, p1, p2, mask, sigma: float = 1.0):
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], -1)
    h2 = jnp.concatenate([p2, ones], -1)
    Hp1 = h1 @ H.T
    Hp1 = Hp1[:, :2] / jnp.where(jnp.abs(Hp1[:, 2:]) < _EPS, _EPS, Hp1[:, 2:])
    Hinv = jnp.linalg.inv(H)
    Hp2 = h2 @ Hinv.T
    Hp2 = Hp2[:, :2] / jnp.where(jnp.abs(Hp2[:, 2:]) < _EPS, _EPS, Hp2[:, 2:])
    inv_s2 = 1.0 / (sigma * sigma)
    chi12 = jnp.sum((p2 - Hp1) ** 2, -1) * inv_s2
    chi21 = jnp.sum((p1 - Hp2) ** 2, -1) * inv_s2
    thr = 5.991
    ok = (chi12 < thr) & (chi21 < thr) & mask
    score = jnp.sum(jnp.where(ok, (thr - chi12) + (thr - chi21), 0.0))
    return score, ok


# ---------------------------------------------------------------------------
# essential matrix on bearings — ref solve/essential_solver
# ---------------------------------------------------------------------------

@geometry_precision
def fit_essential(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """8-point E from unit bearings (k,3)+(k,3): b2^T E b1 = 0."""
    x1, y1, z1 = b1[:, 0], b1[:, 1], b1[:, 2]
    x2, y2, z2 = b2[:, 0], b2[:, 1], b2[:, 2]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2 * z1, y2 * x1, y2 * y1, y2 * z1, z2 * x1, z2 * y1, z2 * z1],
        -1,
    )
    e = _smallest_right_singular(A)
    E = e.reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(E)
    S = jnp.array([1.0, 1.0, 0.0], E.dtype) * (S[0] + S[1]) * 0.5
    return (U * S[None, :]) @ Vt


@geometry_precision
def score_essential(E, b1, b2, mask, thr: float = 1e-3):
    """Angular epipolar residual on the unit sphere (both directions)."""
    Eb1 = b1 @ E.T
    Etb2 = b2 @ E
    num = jnp.sum(b2 * Eb1, -1) ** 2
    d2 = num / jnp.maximum(jnp.sum(Eb1[:, :2] ** 2 + Eb1[:, 2:] ** 2 * 0, -1) + Eb1[:, 2] ** 2, _EPS)
    # distance of b2 to the epipolar plane with normal E b1 (and vice versa)
    n1 = Eb1 / jnp.maximum(jnp.linalg.norm(Eb1, axis=-1, keepdims=True), _EPS)
    n2 = Etb2 / jnp.maximum(jnp.linalg.norm(Etb2, axis=-1, keepdims=True), _EPS)
    r1 = jnp.sum(b2 * n1, -1) ** 2
    r2 = jnp.sum(b1 * n2, -1) ** 2
    ok = (r1 < thr) & (r2 < thr) & mask
    score = jnp.sum(jnp.where(ok, (thr - r1) + (thr - r2), 0.0))
    return score, ok


@geometry_precision
def decompose_essential(E: jnp.ndarray):
    """E -> 4 hypotheses (R (4,3,3), t (4,3)), t unit norm."""
    U, _, Vt = jnp.linalg.svd(E)
    # make proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), _EPS)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


@geometry_precision
def essential_from_F(F: jnp.ndarray, K1: jnp.ndarray, K2: jnp.ndarray) -> jnp.ndarray:
    return K2.T @ F @ K1


# ---------------------------------------------------------------------------
# homography decomposition (Faugeras) — ref initialize/perspective
# ---------------------------------------------------------------------------

@geometry_precision
def decompose_homography(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras decomposition of H (image-to-image, same K both views).

    Returns (R (8,3,3), t (8,3), n (8,3)) candidate motions.  Degenerate
    branches produce harmless duplicates; cheirality selection downstream
    picks the physical one.
    """
    A = jnp.linalg.solve(K, H @ K)
    U, S, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[0], S[1], S[2]

    # case d' = +d2 and -d2; x1/x3 from Faugeras' closed form
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, _EPS), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, _EPS), 0.0))
    e1 = jnp.array([1.0, -1.0, 1.0, -1.0], H.dtype)
    e3 = jnp.array([1.0, 1.0, -1.0, -1.0], H.dtype)

    def case_pos(eps1, eps3):
        sin_t = (d1 - d3) * x1 * x3 / jnp.maximum(d2, _EPS) * eps1 * eps3
        cos_t = (d2 * d2 + d1 * d3) / jnp.maximum(d2 * (d1 + d3), _EPS)
        # Rp: rotation about y by theta
        Rp = jnp.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]], H.dtype)
        Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-sin_t).at[2, 0].set(sin_t).at[2, 2].set(cos_t)
        tp = (d1 - d3) * jnp.stack([eps1 * x1, jnp.zeros_like(x1), -eps3 * x3])
        np_ = jnp.stack([eps1 * x1, jnp.zeros_like(x1), eps3 * x3])
        R = s * U @ Rp @ Vt
        t = (U @ tp[:, None])[:, 0]
        n = (V @ np_[:, None])[:, 0]
        return R, t, n

    def case_neg(eps1, eps3):
        sin_p = (d1 + d3) * x1 * x3 / jnp.maximum(d2, _EPS) * eps1 * eps3
        cos_p = (d1 * d3 - d2 * d2) / jnp.maximum(d2 * (d1 - d3), _EPS)
        Rp = jnp.array([[0.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 0.0]], H.dtype)
        Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(sin_p).at[2, 0].set(sin_p).at[2, 2].set(-cos_p)
        tp = (d1 + d3) * jnp.stack([eps1 * x1, jnp.zeros_like(x1), eps3 * x3])
        np_ = jnp.stack([eps1 * x1, jnp.zeros_like(x1), eps3 * x3])
        R = s * U @ Rp @ Vt
        t = (U @ tp[:, None])[:, 0]
        n = (V @ np_[:, None])[:, 0]
        return R, t, n

    Rs, ts, ns = [], [], []
    for i in range(4):
        R, t, n = case_pos(e1[i], e3[i])
        Rs.append(R), ts.append(t), ns.append(n)
    for i in range(4):
        R, t, n = case_neg(e1[i], e3[i])
        Rs.append(R), ts.append(t), ns.append(n)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    tn = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts = ts / jnp.maximum(tn, _EPS)
    return Rs, ts, jnp.stack(ns)


# ---------------------------------------------------------------------------
# PnP on bearings (linear DLT + SO(3) projection) — ref solve/pnp_solver
# ---------------------------------------------------------------------------

@geometry_precision
def fit_pnp_dlt(bearings: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Linear PnP from k>=6 (bearing, world point) pairs -> T_cw (4,4).

    lambda b = R X + t  =>  hat(b) (R X + t) = 0: 3 rows per point (rank 2).
    Solve for the 12 entries of [R|t], then project R onto SO(3) and fix the
    shared scale from ||R||.  Camera-model agnostic (works on bearings), the
    same property the reference gets from EPnP on bearings.
    """
    k = bearings.shape[0]
    Bx = se3.hat(bearings)                      # (k,3,3)
    X_h = jnp.concatenate([points, jnp.ones((k, 1), points.dtype)], -1)  # (k,4)
    # rows: hat(b) [X^T kron I] theta, theta = vec([R|t]) row-major (12,)
    # Build A (3k, 12): A[i] = kron(X_h[i], I3) premultiplied by hat(b_i)
    A = jnp.einsum("kab,kc->kabc", Bx, X_h).reshape(k * 3, 12)
    theta = _smallest_right_singular(A)
    Rt = theta.reshape(3, 4)
    Rraw = Rt[:, :3]
    t_raw = Rt[:, 3]
    # The DLT solution is defined up to a signed scale.  Resolve the SIGN
    # first via cheirality (depth along the observed bearings must be
    # positive for most points) — projecting a negatively-scaled matrix onto
    # SO(3) directly would mangle the rotation.
    lam = jnp.sum(bearings * (points @ Rraw.T + t_raw), -1)
    sgn = jnp.where(jnp.sum(jnp.sign(lam)) < 0, -1.0, 1.0)
    Rraw = sgn * Rraw
    t_raw = sgn * t_raw
    U, S, Vt = jnp.linalg.svd(Rraw)
    scale = jnp.mean(S)
    det = jnp.linalg.det(U @ Vt)
    R = (U * jnp.array([1.0, 1.0, 1.0], Rraw.dtype).at[2].set(det)[None, :]) @ Vt
    t = t_raw / jnp.maximum(scale, _EPS)
    return se3.from_Rt(R, t)


@geometry_precision
def fit_pnp_epnp(bearings: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """EPnP on bearings from k>=4 pairs -> T_cw (4,4) (ref solve/pnp_solver:
    the reference adapts the EPnP solver to bearing vectors so one solver
    covers all camera models; same here, batched-RANSAC friendly).

    Pipeline: 4 control points (centroid + PCA axes), barycentric alphas,
    nullspace of the 3k x 12 bearing-cross constraint system (via eigh of
    M^T M — fixed work, no dynamic rank logic), beta from the N=1 case
    refined by 5 Gauss-Newton steps over all four betas on the 6 pairwise
    control-point distance constraints, cheirality sign fix, then Kabsch
    alignment of world->camera control points.  Degenerate minimal sets
    produce a finite (if useless) pose that simply scores no inliers.
    """
    k = bearings.shape[0]
    c0 = jnp.mean(points, axis=0)
    Xc = points - c0
    cov = Xc.T @ Xc / k
    evals, evecs = jnp.linalg.eigh(cov)                   # ascending
    axes = (evecs * jnp.sqrt(jnp.maximum(evals, 1e-8))[None, :]).T  # (3,3)
    ctrl_w = jnp.concatenate([c0[None, :], c0[None, :] + axes], 0)  # (4,3)
    # barycentric coordinates: X_i = ctrl_w^T @ alpha_i, sum(alpha)=1
    Ainv = jnp.linalg.inv(axes.T + 1e-12 * jnp.eye(3))
    a123 = Xc @ Ainv.T                                     # (k,3)
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, -1, keepdims=True),
                              a123], axis=-1)              # (k,4)
    # M rows: hat(b_i) sum_j alpha_ij c_j^cam = 0
    Bx = se3.hat(bearings)                                 # (k,3,3)
    M = jnp.einsum("kab,kj->kajb", Bx, alphas).reshape(3 * k, 12)
    MtM = M.T @ M
    _, v = jnp.linalg.eigh(MtM)
    V = v[:, :4].T.reshape(4, 4, 3)                        # (null_idx, ctrl, 3)

    dw = ctrl_w[:, None, :] - ctrl_w[None, :, :]           # (4,4,3)
    iu, ju = jnp.triu_indices(4, 1)
    d2_w = jnp.sum(dw[iu, ju] ** 2, -1)                    # (6,)
    dV = V[:, iu, :] - V[:, ju, :]                         # (4,6,3)
    P = jnp.einsum("apx,bpx->abp", dV, dV)                 # (4,4,6)

    def gn_step(b, _):
        # residuals over the 6 pairwise distances; jacobian wrt the 4 betas
        e = jnp.einsum("a,apx->px", b, dV)                 # (6,3)
        f = jnp.sum(e * e, -1) - d2_w                      # (6,)
        J = 2.0 * jnp.einsum("px,apx->pa", e, dV)          # (6,4)
        JtJ = J.T @ J + 1e-6 * jnp.eye(4)
        g = J.T @ f
        return b - jnp.linalg.solve(JtJ, g), None

    def solve_sym(L, rhs, n):
        LtL = L.T @ L + 1e-9 * jnp.eye(n)
        return jnp.linalg.solve(LtL, L.T @ rhs)

    # the classic EPnP case initializations (N=1,2,3), each refined by
    # Gauss-Newton over all four betas — with a 4-point minimal set the
    # nullspace is 4-dimensional and the N=1 init alone is useless
    b0 = jnp.sum(jnp.sqrt(jnp.maximum(P[0, 0] * d2_w, 0.0))) / jnp.maximum(
        jnp.sum(P[0, 0]), _EPS)
    cand1 = jnp.array([1.0, 0.0, 0.0, 0.0], points.dtype) * b0

    L2 = jnp.stack([P[0, 0], 2.0 * P[0, 1], P[1, 1]], -1)   # (6,3)
    s2 = solve_sym(L2, d2_w, 3)
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(s2[0]), _EPS))
    b2 = s2[1] / b1
    cand2 = jnp.stack([b1, b2, jnp.zeros(()), jnp.zeros(())])

    L3 = jnp.stack([P[0, 0], 2.0 * P[0, 1], P[1, 1],
                    2.0 * P[0, 2], 2.0 * P[1, 2], P[2, 2]], -1)  # (6,6)
    s3 = solve_sym(L3, d2_w, 6)
    c1 = jnp.sqrt(jnp.maximum(jnp.abs(s3[0]), _EPS))
    cand3 = jnp.stack([c1, s3[1] / c1, s3[3] / c1, jnp.zeros(())])

    def pose_from(betas0, sgn):
        betas, _ = jax.lax.scan(gn_step, betas0, None, length=10)
        # both nullspace signs are candidates (with 4 points the cheirality
        # vote can tie 2-2); the bearing-alignment error arbitrates
        ctrl_c = sgn * jnp.einsum("a,apx->px", betas, V)   # (4,3)
        # Kabsch: rigid world->camera from the 4 control-point pairs
        mu_w = jnp.mean(ctrl_w, 0)
        mu_c = jnp.mean(ctrl_c, 0)
        H = (ctrl_w - mu_w).T @ (ctrl_c - mu_c)
        U, S, Vt = jnp.linalg.svd(H)
        det = jnp.linalg.det(Vt.T @ U.T)
        D = jnp.diag(jnp.array([1.0, 1.0, det], points.dtype))
        Rm = Vt.T @ D @ U.T
        t = mu_c - Rm @ mu_w
        T = se3.from_Rt(Rm, t)
        pred = points @ Rm.T + t
        pred = pred / jnp.maximum(
            jnp.linalg.norm(pred, axis=-1, keepdims=True), _EPS)
        err = jnp.sum(1.0 - jnp.sum(pred * bearings, -1))
        return T, err

    cands = jnp.stack([cand1, cand2, cand3, cand1, cand2, cand3])
    signs = jnp.array([1.0, 1.0, 1.0, -1.0, -1.0, -1.0], points.dtype)
    Ts, errs = jax.vmap(pose_from)(cands, signs)
    return Ts[jnp.argmin(errs)]


@geometry_precision
def score_pnp(T_cw, bearings, points, mask, thr_cos: float = 0.9999):
    """Inliers = angle between predicted and observed bearing below thr."""
    pc = points @ T_cw[:3, :3].T + T_cw[:3, 3]
    pred = pc / jnp.maximum(jnp.linalg.norm(pc, axis=-1, keepdims=True), _EPS)
    cosang = jnp.sum(pred * bearings, -1)
    ok = (cosang > thr_cos) & mask
    return jnp.sum(ok.astype(jnp.float32)), ok


# ---------------------------------------------------------------------------
# Sim3 Horn closed form — ref solve/sim3_solver
# ---------------------------------------------------------------------------

@geometry_precision
def fit_sim3_horn(p1: jnp.ndarray, p2: jnp.ndarray, fix_scale: bool = False):
    """Horn 1987 absolute orientation: find (R,t,s) with p2 ~ s R p1 + t.

    p1, p2: (k,3), k>=3.  Returns (R, t, s).
    """
    c1 = jnp.mean(p1, 0)
    c2 = jnp.mean(p2, 0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = q2.T @ q1                      # correlation
    # rotation via SVD of M (equivalent to Horn's quaternion method)
    U, S, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.array([1.0, 1.0, 1.0], p1.dtype).at[2].set(d)
    R = (U * D[None, :]) @ Vt
    if fix_scale:
        s = jnp.ones((), p1.dtype)
    else:
        # s = sum(q2 . R q1) / sum(|q1|^2)  (asymmetric Horn scale)
        s = jnp.sum(q2 * (q1 @ R.T)) / jnp.maximum(jnp.sum(q1 * q1), _EPS)
    t = c2 - s * (R @ c1)
    return R, t, s


@geometry_precision
def score_sim3(g, p1, p2, mask, thr: float):
    """Symmetric 3D transfer error below thr (in squared distance)."""
    R, t, s = g
    p12 = s * (p1 @ R.T) + t
    Rt = R.T
    p21 = ((p2 - t) @ R) / jnp.maximum(s, _EPS)
    e12 = jnp.sum((p12 - p2) ** 2, -1)
    e21 = jnp.sum((p21 - p1) ** 2, -1)
    ok = (e12 < thr) & (e21 < thr) & mask
    del Rt
    return jnp.sum(ok.astype(jnp.float32)), ok
