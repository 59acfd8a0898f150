"""Bundle adjustment with MXU-friendly dense Schur complement (local BA) and a
matrix-free PCG variant (global BA).

Replaces the reference's g2o Levenberg-Marquardt BA
(``optimize/local_bundle_adjuster``: local KFs + landmarks + fixed observer
KFs, LM 5 iters + outlier removal + 10 iters;
``optimize/global_bundle_adjuster``: full map, ~10 iters, force-stop flag).

TPU-first design (SURVEY.md §7 "g2o -> hand-rolled LM"):
* The problem is a fixed-capacity SoA (cams C, landmarks L, observations O)
  with validity masks — one compiled program per bucket size.
* Landmark blocks are 3x3, eliminated in parallel (batched inverse).
* Local BA: the reduced camera system S (6C x 6C) is materialized with ONE
  big matmul  S = blkdiag(Hcc) - Y Wᵀ  where W is the dense (L,C,6,3)
  cross-block tensor — at C<=128 this is exactly the regime where doing the
  "sparse" Schur product densely on the MXU beats any gather-based scheme.
* Global BA: C is unbounded, so S is applied matrix-free inside PCG with a
  block-Jacobi preconditioner; every operator application is a few
  segment-sums over the observation array.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import residuals as R
from ..ops.precision import geometry_precision


class BAProblem(NamedTuple):
    """Fixed-capacity bundle adjustment problem (padded; see masks)."""
    T_cw: jnp.ndarray       # (C,4,4) camera poses (world->cam)
    cam_opt: jnp.ndarray    # (C,) bool: optimize this camera (False = fixed/pad)
    cam_valid: jnp.ndarray  # (C,) bool: camera slot is real
    X: jnp.ndarray          # (L,3) landmark positions
    lm_valid: jnp.ndarray   # (L,) bool
    obs_cam: jnp.ndarray    # (O,) int32 camera index
    obs_lm: jnp.ndarray     # (O,) int32 landmark index
    obs_uv: jnp.ndarray     # (O,2) mono or (O,3) stereo observations
    obs_sigma2: jnp.ndarray # (O,) variance (scale^2*octave)
    obs_mask: jnp.ndarray   # (O,) bool


class BAResult(NamedTuple):
    T_cw: jnp.ndarray
    X: jnp.ndarray
    obs_inlier: jnp.ndarray
    cost: jnp.ndarray


def _rho(c2, thr):
    """Huber robust cost."""
    return jnp.where(c2 <= thr, c2, 2.0 * jnp.sqrt(thr * jnp.maximum(c2, 0.0)) - thr)


def _residuals_and_jacs(res_fn, T_cw, X, obs_cam, obs_lm, obs_uv):
    """All residuals (O,D) + Jacobians wrt cam increment (O,D,6) and landmark
    position (O,D,3), via one vmapped forward-mode autodiff call."""
    def r_of(xi, dX, o_cam, o_lm, o_uv):
        T = R.perturb_pose(xi, T_cw[o_cam])
        r, ok = res_fn(T, X[o_lm] + dX, o_uv)
        return r, ok

    z6 = jnp.zeros(6, T_cw.dtype)
    z3 = jnp.zeros(3, T_cw.dtype)

    def per_obs(o_cam, o_lm, o_uv):
        (r, ok) = r_of(z6, z3, o_cam, o_lm, o_uv)
        Jc = jax.jacfwd(lambda xi: r_of(xi, z3, o_cam, o_lm, o_uv)[0])(z6)
        Jl = jax.jacfwd(lambda dX: r_of(z6, dX, o_cam, o_lm, o_uv)[0])(z3)
        return r, ok, Jc, Jl

    return jax.vmap(per_obs)(obs_cam, obs_lm, obs_uv)


_SHARED_BA: dict = {}


def _cam_key(cam) -> tuple:
    from ..camera.base import camera_to_config
    return tuple(sorted(camera_to_config(cam).items()))


def shared_local_ba(cam, stereo: bool = False, first_iters: int = 5,
                    second_iters: int = 10, multicam: bool = False):
    """Process-wide memo over make_local_ba keyed by the camera's serialized
    spec + schedule: Systems with equal cameras share one set of compiled
    BA bucket programs instead of re-jitting per session (a multi-second
    remote compile per bucket on tunnel-attached TPUs; the multi-session
    runner was compile-bound without this)."""
    key = ("local", _cam_key(cam), stereo, first_iters, second_iters,
           multicam)
    fn = _SHARED_BA.get(key)
    if fn is None:
        from . import residuals as _R2
        fn = make_local_ba(
            cam, stereo=stereo, first_iters=first_iters,
            second_iters=second_iters,
            res_fn_override=(
                _R2.make_multicam_mono_residual() if multicam else None),
        )
        _SHARED_BA[key] = fn
    return fn


def shared_global_ba(cam, stereo: bool = False, iters: int = 10,
                     cg_iters: int = 40, multicam: bool = False):
    """Process-wide memo over make_global_ba (see shared_local_ba)."""
    key = ("global", _cam_key(cam), stereo, iters, cg_iters, multicam)
    fn = _SHARED_BA.get(key)
    if fn is None:
        from . import residuals as _R2
        fn = make_global_ba(
            cam, stereo=stereo, iters=iters, cg_iters=cg_iters,
            res_fn_override=(
                _R2.make_multicam_mono_residual() if multicam else None),
        )
        _SHARED_BA[key] = fn
    return fn


def make_local_ba(cam, stereo: bool = False, first_iters: int = 5,
                  second_iters: int = 10, res_fn_override=None):
    """Dense-Schur local BA, one jitted program per (C, L, O) bucket.

    Returns fn(problem: BAProblem) -> BAResult.  Mirrors the reference's
    two-phase schedule: `first_iters` LM iterations, outlier re-weighting
    (observations beyond the chi2 gate are dropped), `second_iters` more.

    res_fn_override: alternative residual(T, X, obs_vec), e.g. the
    multi-camera edge (per-observation intrinsics in obs_uv columns 2..)
    for local windows that span keyframes from different cameras
    (ref: g2o reproj_edge_wrapper dispatches on the keyframe's camera).
    """
    if res_fn_override is not None:
        res_fn = res_fn_override
        chi2_thr = R.CHI2_2D
    else:
        res_fn = R.make_stereo_residual(cam) if stereo else R.make_mono_residual(cam)
        chi2_thr = R.CHI2_3D if stereo else R.CHI2_2D

    def lm_phase(p: BAProblem, active: jnp.ndarray, iters: int):
        C = p.T_cw.shape[0]
        L = p.X.shape[0]
        inv_s2 = 1.0 / jnp.maximum(p.obs_sigma2, 1e-12)
        obs_ok_static = (
            active & p.obs_mask
            & p.cam_valid[p.obs_cam] & p.lm_valid[p.obs_lm]
        )
        cam_free = p.cam_opt & p.cam_valid            # (C,)
        m6 = jnp.repeat(cam_free, 6).astype(p.T_cw.dtype)   # (6C,)

        def cost_of(T, X):
            def r_only(o_cam, o_lm, o_uv):
                return res_fn(T[o_cam], X[o_lm], o_uv)
            r, ok = jax.vmap(r_only)(p.obs_cam, p.obs_lm, p.obs_uv)
            c2 = jnp.sum(r * r, -1) * inv_s2
            w = (obs_ok_static & ok).astype(T.dtype)
            return jnp.sum(_rho(c2, chi2_thr) * w), c2, ok

        def body(carry, _):
            T, X, lam, _cost = carry
            r, ok, Jc, Jl = _residuals_and_jacs(
                res_fn, T, X, p.obs_cam, p.obs_lm, p.obs_uv
            )
            c2 = jnp.sum(r * r, -1) * inv_s2
            w = (
                R.huber_weight(c2, chi2_thr) * inv_s2
                * (obs_ok_static & ok).astype(T.dtype)
            )
            # zero camera jacobians of fixed cameras (they still constrain lms)
            Jc = Jc * cam_free[p.obs_cam][:, None, None]

            Hcc = jnp.zeros((C, 6, 6), T.dtype).at[p.obs_cam].add(
                jnp.einsum("odi,odj,o->oij", Jc, Jc, w)
            )
            Hll = jnp.zeros((L, 3, 3), T.dtype).at[p.obs_lm].add(
                jnp.einsum("odi,odj,o->oij", Jl, Jl, w)
            )
            gc = jnp.zeros((C, 6), T.dtype).at[p.obs_cam].add(
                jnp.einsum("odi,od,o->oi", Jc, r, w)
            )
            gl = jnp.zeros((L, 3), T.dtype).at[p.obs_lm].add(
                jnp.einsum("odi,od,o->oi", Jl, r, w)
            )
            Wt = jnp.zeros((L, C, 6, 3), T.dtype).at[(p.obs_lm, p.obs_cam)].add(
                jnp.einsum("odi,odj,o->oij", Jc, Jl, w)
            )
            # damping (LM, multiplicative on block diagonals)
            eyec = jnp.eye(6, dtype=T.dtype)
            eyel = jnp.eye(3, dtype=T.dtype)
            Hcc_d = Hcc + lam * Hcc * eyec + 1e-8 * eyec
            Hll_d = Hll + lam * Hll * eyel + 1e-8 * eyel
            # guard invalid landmark blocks -> identity
            lmv = p.lm_valid[:, None, None]
            Hll_d = jnp.where(lmv, Hll_d, eyel)
            Hll_inv = jnp.linalg.inv(Hll_d)

            Y = jnp.einsum("lcik,lkm->lcim", Wt, Hll_inv)       # (L,C,6,3)
            Yr = Y.transpose(1, 2, 0, 3).reshape(C * 6, L * 3)
            Wr = Wt.transpose(1, 2, 0, 3).reshape(C * 6, L * 3)
            S = -jnp.dot(Yr, Wr.T, preferred_element_type=jnp.float32)
            S = S.reshape(C, 6, C, 6)
            diag_idx = jnp.arange(C)
            S = S.at[diag_idx, :, diag_idx, :].add(Hcc_d)
            S = S.reshape(C * 6, C * 6)
            v = (-gc + jnp.einsum("lcim,lm->ci", Y, gl)).reshape(C * 6)
            # mask fixed/invalid cameras out of the system
            S = S * m6[:, None] * m6[None, :] + jnp.diag(1.0 - m6)
            v = v * m6
            dxc = jnp.linalg.solve(S, v).reshape(C, 6)
            dxl = -jnp.einsum(
                "lkm,lm->lk", Hll_inv,
                gl + jnp.einsum("lcik,ci->lk", Wt, dxc),
            )
            dxl = dxl * p.lm_valid[:, None]

            T_new = jax.vmap(R.perturb_pose)(dxc * cam_free[:, None], T)
            X_new = X + dxl
            cost_new, _, _ = cost_of(T_new, X_new)
            cost_old, _, _ = cost_of(T, X)
            # a diverged step can produce non-finite poses/points whose
            # residuals are all masked by the validity gate -> cost 0: never
            # accept a non-finite state (reject instead and let lam recover)
            finite = (jnp.isfinite(dxc).all() & jnp.isfinite(dxl).all())
            accept = (cost_new < cost_old) & finite
            T_out = jnp.where(accept, T_new, T)
            X_out = jnp.where(accept, X_new, X)
            lam_out = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6
            )
            return (T_out, X_out, lam_out, jnp.minimum(cost_new, cost_old)), None

        init = (p.T_cw, p.X, jnp.float32(1e-4), jnp.float32(0.0))
        (T, X, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        _, c2, ok = cost_of(T, X)
        return T, X, c2, ok, cost

    @jax.jit
    @geometry_precision
    def optimize(p: BAProblem) -> BAResult:
        active = p.obs_mask
        T, X, c2, ok, _ = lm_phase(p, active, first_iters)
        active = active & ok & (c2 < chi2_thr)
        p2 = p._replace(T_cw=T, X=X)
        T, X, c2, ok, cost = lm_phase(p2, active, second_iters)
        inlier = active & ok & (c2 < chi2_thr)
        return BAResult(T, X, inlier, cost)

    return optimize


# ---------------------------------------------------------------------------
# Global BA: matrix-free Schur + PCG
# ---------------------------------------------------------------------------

def make_global_ba(cam, stereo: bool = False, iters: int = 10, cg_iters: int = 40,
                   res_fn_override=None):
    """Matrix-free LM for full-map BA (unbounded camera count).

    Same problem struct as local BA; S is never materialized — each PCG step
    applies S x = Hcc x - W (Hll^-1 (Wᵀ x)) with segment-sums over obs.
    Gauge: pass cam_opt=False for the origin keyframe.

    res_fn_override: alternative residual(T, X, obs_vec) (e.g. the
    multi-camera residual, where per-obs intrinsics ride in obs_uv columns
    2..; the residual itself stays 2-D so chi2/weights are unchanged).
    """
    if res_fn_override is not None:
        res_fn = res_fn_override
        chi2_thr = R.CHI2_2D
    else:
        res_fn = R.make_stereo_residual(cam) if stereo else R.make_mono_residual(cam)
        chi2_thr = R.CHI2_3D if stereo else R.CHI2_2D

    @jax.jit
    @geometry_precision
    def optimize(p: BAProblem) -> BAResult:
        C = p.T_cw.shape[0]
        L = p.X.shape[0]
        inv_s2 = 1.0 / jnp.maximum(p.obs_sigma2, 1e-12)
        cam_free = p.cam_opt & p.cam_valid
        obs_ok_static = (
            p.obs_mask & p.cam_valid[p.obs_cam] & p.lm_valid[p.obs_lm]
        )

        def cost_of(T, X):
            def r_only(o_cam, o_lm, o_uv):
                return res_fn(T[o_cam], X[o_lm], o_uv)
            r, ok = jax.vmap(r_only)(p.obs_cam, p.obs_lm, p.obs_uv)
            c2 = jnp.sum(r * r, -1) * inv_s2
            w = (obs_ok_static & ok).astype(T.dtype)
            return jnp.sum(_rho(c2, chi2_thr) * w), c2, ok

        def body(carry, _):
            T, X, lam, _ = carry
            r, ok, Jc, Jl = _residuals_and_jacs(
                res_fn, T, X, p.obs_cam, p.obs_lm, p.obs_uv
            )
            c2 = jnp.sum(r * r, -1) * inv_s2
            w = (
                R.huber_weight(c2, chi2_thr) * inv_s2
                * (obs_ok_static & ok).astype(T.dtype)
            )
            Jc = Jc * cam_free[p.obs_cam][:, None, None]

            Hcc = jnp.zeros((C, 6, 6), T.dtype).at[p.obs_cam].add(
                jnp.einsum("odi,odj,o->oij", Jc, Jc, w)
            )
            Hll = jnp.zeros((L, 3, 3), T.dtype).at[p.obs_lm].add(
                jnp.einsum("odi,odj,o->oij", Jl, Jl, w)
            )
            gc = jnp.zeros((C, 6), T.dtype).at[p.obs_cam].add(
                jnp.einsum("odi,od,o->oi", Jc, r, w)
            )
            gl = jnp.zeros((L, 3), T.dtype).at[p.obs_lm].add(
                jnp.einsum("odi,od,o->oi", Jl, r, w)
            )
            eyec = jnp.eye(6, dtype=T.dtype)
            eyel = jnp.eye(3, dtype=T.dtype)
            Hcc_d = Hcc + lam * Hcc * eyec + 1e-8 * eyec
            Hll_d = Hll + lam * Hll * eyel + 1e-8 * eyel
            Hll_d = jnp.where(p.lm_valid[:, None, None], Hll_d, eyel)
            Hll_inv = jnp.linalg.inv(Hll_d)

            # per-observation W_o = w * Jc^T Jl (6,3): used to apply Hcl/Hlc
            Wo = jnp.einsum("odi,odj,o->oij", Jc, Jl, w)       # (O,6,3)

            def S_apply(x):                                     # x: (C,6)
                # u_l = sum_o Wo^T x[cam_o]  (Hlc x)
                u = jnp.zeros((L, 3), x.dtype).at[p.obs_lm].add(
                    jnp.einsum("oij,oi->oj", Wo, x[p.obs_cam])
                )
                y = jnp.einsum("lkm,lm->lk", Hll_inv, u)        # Hll^-1 u
                z = jnp.zeros((C, 6), x.dtype).at[p.obs_cam].add(
                    jnp.einsum("oij,oj->oi", Wo, y[p.obs_lm])
                )
                return jnp.einsum("cij,cj->ci", Hcc_d, x) - z

            rhs = -gc + (
                jnp.zeros((C, 6), T.dtype).at[p.obs_cam].add(
                    jnp.einsum(
                        "oij,oj->oi", Wo,
                        jnp.einsum("lkm,lm->lk", Hll_inv, gl)[p.obs_lm],
                    )
                )
            )
            rhs = rhs * cam_free[:, None]

            # block-Jacobi preconditioner from Hcc_d
            Minv = jnp.linalg.inv(
                jnp.where(cam_free[:, None, None], Hcc_d, jnp.eye(6, dtype=T.dtype))
            )

            def precond(x):
                return jnp.einsum("cij,cj->ci", Minv, x)

            def cg_body(carry2, _):
                x, rvec, pvec, rz = carry2
                Ap = S_apply(pvec) * cam_free[:, None]
                alpha = rz / jnp.maximum(jnp.sum(pvec * Ap), 1e-12)
                x = x + alpha * pvec
                rvec = rvec - alpha * Ap
                z = precond(rvec) * cam_free[:, None]
                rz_new = jnp.sum(rvec * z)
                beta = rz_new / jnp.maximum(rz, 1e-12)
                pvec = z + beta * pvec
                return (x, rvec, pvec, rz_new), None

            x0 = jnp.zeros((C, 6), T.dtype)
            z0 = precond(rhs) * cam_free[:, None]
            (dxc, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, rhs, z0, jnp.sum(rhs * z0)), None, length=cg_iters
            )
            dxc = dxc * cam_free[:, None]

            u = jnp.zeros((L, 3), T.dtype).at[p.obs_lm].add(
                jnp.einsum("oij,oi->oj", Wo, dxc[p.obs_cam])
            )
            dxl = -jnp.einsum("lkm,lm->lk", Hll_inv, gl + u) * p.lm_valid[:, None]

            T_new = jax.vmap(R.perturb_pose)(dxc, T)
            X_new = X + dxl
            cost_new, _, _ = cost_of(T_new, X_new)
            cost_old, _, _ = cost_of(T, X)
            # same non-finite guard as local BA: a NaN state masks all its
            # residuals and would be accepted as cost 0
            finite = (jnp.isfinite(dxc).all() & jnp.isfinite(dxl).all())
            accept = (cost_new < cost_old) & finite
            return (
                jnp.where(accept, T_new, T),
                jnp.where(accept, X_new, X),
                jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6),
                jnp.minimum(cost_new, cost_old),
            ), None

        init = (p.T_cw, p.X, jnp.float32(1e-4), jnp.float32(0.0))
        (T, X, _, cost), _ = jax.lax.scan(body, init, None, length=iters)
        _, c2, ok = cost_of(T, X)
        inlier = obs_ok_static & ok & (c2 < chi2_thr)
        return BAResult(T, X, inlier, cost)

    return optimize
