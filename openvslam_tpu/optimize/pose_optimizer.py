"""Pose-only Levenberg-Marquardt (ref ``optimize/pose_optimizer``: g2o LM,
unary reprojection edges, 4 rounds x 10 iterations with inlier
reclassification between rounds, Huber at chi2 5.991/7.815).

TPU-native: the whole 4x10 schedule is ONE jitted program — residuals and
6-DoF Jacobians for all observations come from one vmapped autodiff call,
the normal equations are a (6,6) solve, and rounds/iters are lax.fori_loops.
Fixed observation capacity + validity mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import residuals as R
from ..ops.precision import geometry_precision


class PoseOptResult(NamedTuple):
    T_cw: jnp.ndarray        # (4,4) optimized pose
    inliers: jnp.ndarray     # (N,) bool final inlier classification
    num_inliers: jnp.ndarray # () int32
    chi2: jnp.ndarray        # (N,) final per-obs chi2


def _use_pallas_poselm() -> bool:
    """Fused whole-schedule Pallas LM on accelerators (2.1-2.3x vs the XLA
    loop, identical inlier decisions — docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)); XLA
    elsewhere.  Opt out with OPENVSLAM_TPU_PALLAS_POSELM=0."""
    import os

    if os.environ.get("OPENVSLAM_TPU_PALLAS_POSELM", "") == "0":
        return False
    return jax.default_backend() != "cpu"


_SHARED_JITTED: dict = {}


def make_pose_optimizer(cam, stereo: bool = False, num_rounds: int = 4,
                        iters_per_round: int = 10, jit: bool = True,
                        allow_pallas: bool = True):
    """Memoizing wrapper over the factory below: jitted optimizers are
    cached per (camera spec, schedule) so Systems with equal cameras share
    one compiled program instead of re-jitting per session (a full remote
    compile on tunnel-attached TPUs).  Non-jit (composable) requests are
    not cached — they are traced into the caller's program anyway."""
    if not jit:
        return _make_pose_optimizer(cam, stereo, num_rounds,
                                    iters_per_round, jit=False,
                                    allow_pallas=allow_pallas)
    from ..camera.base import camera_to_config
    key = (tuple(sorted(camera_to_config(cam).items())),
           bool(stereo), int(num_rounds), int(iters_per_round),
           _use_pallas_poselm() and allow_pallas)
    fn = _SHARED_JITTED.get(key)
    if fn is None:
        fn = _make_pose_optimizer(cam, stereo, num_rounds,
                                  iters_per_round, jit=True,
                                  allow_pallas=allow_pallas)
        _SHARED_JITTED[key] = fn
    return fn


def _make_pose_optimizer(cam, stereo: bool = False, num_rounds: int = 4,
                         iters_per_round: int = 10, jit: bool = True,
                         allow_pallas: bool = True):
    """Build a jitted pose optimizer for one camera model.

    Returned fn(T_init (4,4), X_w (N,3), obs (N,2|3), sigma2 (N,), mask (N,))
    -> PoseOptResult.  `obs` is uv for mono, (u,v,u_right) for stereo
    (u_right < 0 marks a mono observation inside a stereo frame).

    On accelerator backends with a perspective camera the whole 4x10
    schedule dispatches to one Pallas kernel (ops.pallas.pose_lm_kernel);
    fisheye/equirectangular cameras and CPU use the autodiff XLA loop.

    jit=False returns the raw traced function for composition inside a
    larger jitted program (models.track_step).
    """
    if (_use_pallas_poselm() and allow_pallas
            and getattr(cam, "model_name", "") == "perspective"):
        from ..ops.pallas.pose_lm_kernel import pose_lm_pallas

        kw = dict(
            fx=float(cam.fx), fy=float(cam.fy),
            cx=float(cam.cx), cy=float(cam.cy),
            fxb=float(cam.focal_x_baseline) if stereo else 0.0,
            chi2_thr=R.CHI2_3D if stereo else R.CHI2_2D,
            num_rounds=num_rounds, iters_per_round=iters_per_round,
        )

        def optimize_pallas(T_init, X_w, obs, sigma2, mask):
            T, inl, n, c2 = pose_lm_pallas(T_init, X_w, obs, sigma2, mask,
                                           **kw)
            return PoseOptResult(T, inl, n, c2)

        return jax.jit(optimize_pallas) if jit else optimize_pallas
    res_fn = R.make_stereo_residual(cam) if stereo else R.make_mono_residual(cam)
    chi2_thr = R.CHI2_3D if stereo else R.CHI2_2D

    def jac_resid_all(T, X, obs):
        # one forward-mode pass yields J AND the residual at T (has_aux) —
        # the LM body is latency-bound on TPU, so every eliminated vmap pass
        # over the N observations counts
        def r_of_xi(xi, Xi, oi):
            r, ok = res_fn(R.perturb_pose(xi, T), Xi, oi)
            return r, (r, ok)
        J, (r, ok) = jax.vmap(
            jax.jacfwd(r_of_xi, has_aux=True), in_axes=(None, 0, 0)
        )(jnp.zeros(6, T.dtype), X, obs)
        return J, r, ok  # (N,d,6), (N,d), (N,)

    @geometry_precision
    def optimize(T_init, X_w, obs, sigma2, mask):
        inv_s2 = 1.0 / jnp.maximum(sigma2, 1e-12)

        def rho(c):
            return jnp.where(c <= chi2_thr, c,
                             2.0 * jnp.sqrt(chi2_thr * jnp.maximum(c, 0.0)) - chi2_thr)

        def eval_state(T):
            J, r, ok = jac_resid_all(T, X_w, obs)            # (N,d,6),(N,d)
            c2 = jnp.sum(r * r, -1) * inv_s2
            return J, r, ok, c2

        # (J, r, ok, c2) at the current accepted pose ride through BOTH scans:
        # each iteration does exactly ONE jacfwd pass (at the trial point) and
        # keeps it on accept — the naive loop's second pass per iteration and
        # its round-boundary re-evaluations are recomputing values the carry
        # already holds.  Accept/reject decisions are bit-identical.
        def lm_round(carry, _):
            T, active, J, r, ok, c2 = carry
            msk = active & mask

            def lm_iter(carry2, _):
                T, J, r, ok, c2, cost, lam = carry2
                w = R.huber_weight(c2, chi2_thr) * inv_s2 * (msk & ok)
                # augmented normal equations in ONE contraction:
                # G = [J r]^T W [J r]  ->  H = G[:6,:6], J^T W r = G[:6,6]
                A = jnp.concatenate([J, r[:, :, None]], axis=2)  # (N,d,7)
                G = jnp.einsum("nda,ndb,n->ab", A, A, w)
                H = G[:6, :6]
                grad = G[:6, 6]
                # NB: keep the LU custom call — a closed-form 3x3 block-Schur
                # solve was measured 2.4x SLOWER (docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)): its
                # ~25 tiny VPU ops cost more launch latency than one fused
                # custom call.
                Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
                dx = -jnp.linalg.solve(Hd, grad)
                T_try = R.perturb_pose(dx, T)
                J2, r2, ok2, c2n = eval_state(T_try)
                mskf = msk.astype(T.dtype)
                cost_try = jnp.sum(rho(c2n) * mskf * ok2)
                # never accept a non-finite pose (its masked residuals would
                # read as cost 0)
                finite = jnp.isfinite(T_try).all()
                accept = (cost_try < cost) & finite
                return (
                    jnp.where(accept, T_try, T),
                    jnp.where(accept, J2, J),
                    jnp.where(accept, r2, r),
                    jnp.where(accept, ok2, ok),
                    jnp.where(accept, c2n, c2),
                    jnp.where(accept, cost_try, cost),
                    jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                             1e-9, 1e6),
                ), None

            cost0 = jnp.sum(rho(c2) * msk.astype(T.dtype) * ok)
            (T, J, r, ok, c2, _, _), _ = jax.lax.scan(
                lm_iter, (T, J, r, ok, c2, cost0, jnp.float32(1e-3)),
                None, length=iters_per_round,
            )
            active_new = mask & ok & (c2 < chi2_thr)
            return (T, active_new, J, r, ok, c2), None

        J0, r0, ok0, c20 = eval_state(T_init)
        (T_fin, active, _, _, ok, c2), _ = jax.lax.scan(
            lm_round, (T_init, mask, J0, r0, ok0, c20), None, length=num_rounds
        )
        inl = mask & ok & (c2 < chi2_thr)
        return PoseOptResult(T_fin, inl, jnp.sum(inl.astype(jnp.int32)), c2)

    return jax.jit(optimize) if jit else optimize
