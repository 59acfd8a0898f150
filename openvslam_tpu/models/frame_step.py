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
from ..optimize.pose_optimizer import make_pose_optimizer
from .frontend import OrbFrontend, Keypoints


def match_and_optimize(cam, num_levels, scale_factors, sigma2, pose_core,
                       kp_xy, kp_desc_i8, kp_level, kp_valid,
                       T_pred, lm_pos, lm_desc_i8, lm_valid, lm_pred_level,
                       use_pallas=None):
    """The post-extraction half of the fused step: projection-gated MXU
    Hamming matching of the local map + the pose-only LM schedule.  Shared
    by FrameStep (single stream, Pallas kernels) and BatchFrameStep (vmapped
    over streams, use_pallas=False) so their semantics cannot drift.
    Returns (T_cw, num_inliers, lm_kpt_idx)."""
    und = cam.undistort_keypoints(kp_xy)
    pc = se3.transform(T_pred, lm_pos)
    uv, depth, vis = cam.project(pc)
    vis = vis & lm_valid
    lvl = jnp.clip(lm_pred_level, 0, num_levels - 1)
    radius = 7.0 * scale_factors[lvl]
    idx, dist = M.projection_scale_match(
        lm_desc_i8, kp_desc_i8, uv, vis, radius, lm_pred_level,
        und, kp_level, kp_valid,
        max_dist=M.HAMMING_DIST_THR_HIGH, ratio=0.9, cross_check=True,
        use_pallas=use_pallas,
    )
    matched = idx >= 0
    kpt = jnp.clip(idx, 0)
    obs_uv = und[kpt]
    obs_sig = sigma2[jnp.clip(kp_level[kpt], 0, num_levels - 1)]
    res = pose_core(T_pred, lm_pos, obs_uv, obs_sig, matched)
    return res.T_cw, res.num_inliers, idx


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
        self._pose_core = make_pose_optimizer(
            cam, stereo=False, num_rounds=opt_rounds,
            iters_per_round=iters_per_round, jit=False,
        )
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
        kp: Keypoints = self.frontend._extract_impl(image_u8, None)
        T, inl, idx = match_and_optimize(
            self.cam, self.num_levels, self.scale_factors, self.sigma2,
            self._pose_core, kp.xy, kp.desc_i8, kp.level, kp.valid,
            T_pred, lm_pos, lm_desc_i8, lm_valid, lm_pred_level,
        )
        return FrameStepResult(T, inl, kp.xy, kp.valid, idx, kp.desc_u32)
