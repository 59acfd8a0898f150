"""The flagship fused per-frame model: ONE jitted program that takes an image
and the local map and returns the tracked pose.

This is the TPU answer to the reference's per-frame hot path (SURVEY.md §3.2
HOT-1/2/3): pyramid + FAST + BRIEF extraction, projection-gated MXU Hamming
matching against the local map, and the full 4x10 pose-only LM schedule —
fused into a single XLA program so the per-frame host<->device traffic is one
image upload and one small pose download.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import match as M
from ..ops import se3
from ..ops.precision import geometry_precision
from ..optimize import residuals as R
from .frontend import OrbFrontend, Keypoints


class FrameStepResult(NamedTuple):
    T_cw: jnp.ndarray         # (4,4) optimized pose
    num_inliers: jnp.ndarray  # ()
    kp_xy: jnp.ndarray        # (K,2)
    kp_valid: jnp.ndarray     # (K,)
    lm_kpt_idx: jnp.ndarray   # (L,) matched keypoint per landmark (-1 none)
    kp_desc_u32: jnp.ndarray  # (K,8)


class FrameStep:
    """Fused extract+match+optimize step for a fixed camera geometry."""

    def __init__(self, cam, max_keypts=2048, num_levels=8, scale_factor=1.2,
                 ini_fast_thr=20.0, min_fast_thr=7.0, lm_capacity=4096,
                 opt_rounds=4, iters_per_round=10):
        self.cam = cam
        self.frontend = OrbFrontend(
            rows=cam.rows, cols=cam.cols, max_keypts=max_keypts,
            num_levels=num_levels, scale_factor=scale_factor,
            ini_fast_thr=ini_fast_thr, min_fast_thr=min_fast_thr,
        )
        self.lm_capacity = lm_capacity
        self.num_levels = num_levels
        self.scale_factors = jnp.asarray(
            [scale_factor**l for l in range(num_levels)], jnp.float32
        )
        self.sigma2 = self.scale_factors**2
        self.opt_rounds = opt_rounds
        self.iters_per_round = iters_per_round
        self.step = jax.jit(self._step_impl)

    def example_args(self, seed=0):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 255, (self.cam.rows, self.cam.cols), np.uint8)
        L = self.lm_capacity
        T_pred = jnp.eye(4, dtype=jnp.float32)
        lm_pos = jnp.asarray(
            rng.standard_normal((L, 3)) * 2 + np.array([0, 0, 6]), jnp.float32
        )
        lm_desc = jnp.asarray(rng.integers(0, 2, (L, 256)), jnp.int8)
        lm_valid = jnp.ones(L, bool)
        lm_lvl = jnp.zeros(L, jnp.int32)
        return (jnp.asarray(img), T_pred, lm_pos, lm_desc, lm_valid, lm_lvl)

    def _step_impl(self, image_u8, T_pred, lm_pos, lm_desc_i8, lm_valid, lm_pred_level):
        cam = self.cam
        kp: Keypoints = self.frontend._extract_impl(image_u8, None)
        und = cam.undistort_keypoints(kp.xy)

        # --- projection-gated matching of local-map landmarks ---
        pc = se3.transform(T_pred, lm_pos)
        uv, depth, vis = cam.project(pc)
        vis = vis & lm_valid
        lvl = jnp.clip(lm_pred_level, 0, self.num_levels - 1)
        radius = 7.0 * self.scale_factors[lvl]
        idx, dist = M.projection_scale_match(
            lm_desc_i8, kp.desc_i8, uv, vis, radius, lm_pred_level,
            und, kp.level, kp.valid,
            max_dist=M.HAMMING_DIST_THR_HIGH, ratio=0.9, cross_check=True,
        )
        matched = idx >= 0
        kpt = jnp.clip(idx, 0)

        # --- pose-only LM over the matched landmark set ---
        obs_uv = und[kpt]
        obs_sig = self.sigma2[jnp.clip(kp.level[kpt], 0, self.num_levels - 1)]
        res_fn = R.make_mono_residual(cam)
        inv_s2 = 1.0 / jnp.maximum(obs_sig, 1e-12)
        chi2_thr = R.CHI2_2D

        def resid_all(T):
            r, ok = jax.vmap(res_fn, in_axes=(None, 0, 0))(T, lm_pos, obs_uv)
            return r, ok

        def jac_all(T):
            def r_of_xi(xi, Xi, oi):
                r, _ = res_fn(R.perturb_pose(xi, T), Xi, oi)
                return r
            return jax.vmap(jax.jacfwd(r_of_xi), in_axes=(None, 0, 0))(
                jnp.zeros(6, T_pred.dtype), lm_pos, obs_uv
            )

        def rho(c):
            return jnp.where(c <= chi2_thr, c,
                             2.0 * jnp.sqrt(chi2_thr * jnp.maximum(c, 0.0)) - chi2_thr)

        def lm_round(carry, _):
            T, active = carry

            def lm_iter(carry2, _):
                T, lam = carry2
                r, ok = resid_all(T)
                c2 = jnp.sum(r * r, -1) * inv_s2
                w = R.huber_weight(c2, chi2_thr) * inv_s2 * (active & ok)
                J = jac_all(T)
                H = jnp.einsum("ndi,ndj,n->ij", J, J, w)
                grad = jnp.einsum("ndi,nd,n->i", J, r, w)
                Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
                dx = -jnp.linalg.solve(Hd, grad)
                T_new = R.perturb_pose(dx, T)
                r2, ok2 = resid_all(T_new)
                c2n = jnp.sum(r2 * r2, -1) * inv_s2
                msk = active.astype(T.dtype)
                c_new = jnp.sum(rho(c2n) * msk * ok2)
                c_old = jnp.sum(rho(c2) * msk * ok)
                accept = c_new < c_old
                return (jnp.where(accept, T_new, T),
                        jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)), None

            (T, _), _ = jax.lax.scan(
                lm_iter, (T, jnp.float32(1e-3)), None, length=self.iters_per_round
            )
            r, ok = resid_all(T)
            c2 = jnp.sum(r * r, -1) * inv_s2
            return (T, matched & ok & (c2 < chi2_thr)), None

        # the LM core accumulates J^T J over all observations — pin it to
        # full f32 (ops.precision); extraction/matching above stay one-pass
        @geometry_precision
        def run_lm(T0):
            return jax.lax.scan(
                lm_round, (T0, matched), None, length=self.opt_rounds
            )[0]

        T_fin, active = run_lm(T_pred)
        n_inl = jnp.sum(active.astype(jnp.int32))
        return FrameStepResult(T_fin, n_inl, kp.xy, kp.valid, idx, kp.desc_u32)
