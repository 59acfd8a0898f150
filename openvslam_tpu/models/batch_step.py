"""Batched multi-stream tracking step: K frames (one per session/stream)
through extraction + guided matching + pose-only LM in ONE device program.

The single-stream FrameStep is latency-bound: its ~1k-keypoint tensors fill
the v5e MXU to only 12-15% (docs/kernels.md speed-of-light table).  Running
K independent streams per chip — the BASELINE config-#5 / offline-mapping
regime — batches every contraction K-fold and amortizes launch overhead:

* FAST: the K frames are row-stacked into ONE Pallas launch per pyramid
  level (ops.fast.detect_level_batch; bit-exact vs per-frame).
* blur / describe / matcher / pose-LM: the single-frame formulations under
  vmap.  The Pallas matcher and pose-LM kernels carry scalar-prefetch
  operands that cannot be batched, so the vmapped XLA formulations run
  instead — per-frame results are identical BY CONSTRUCTION to FrameStep
  with those kernels opted out (the kernels are themselves bit-validated
  against these formulations).

Use `bench_batch.py` for the aggregate frames/s/chip measurement; the
single-stream `bench.py` remains the per-frame latency benchmark.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..optimize.pose_optimizer import make_pose_optimizer
from .frame_step import match_and_optimize
from .frontend import OrbFrontend


class BatchStepResult(NamedTuple):
    T_cw: jnp.ndarray         # (B,4,4)
    num_inliers: jnp.ndarray  # (B,)
    kp_xy: jnp.ndarray        # (B,K,2)
    kp_valid: jnp.ndarray     # (B,K)
    lm_kpt_idx: jnp.ndarray   # (B,L)
    kp_desc_u32: jnp.ndarray  # (B,K,8)


class BatchFrameStep:
    """Fused extract+match+optimize for a fixed batch of same-camera streams."""

    def __init__(self, cam, max_keypts=2048, num_levels=8, scale_factor=1.2,
                 ini_fast_thr=20.0, min_fast_thr=7.0, lm_capacity=4096,
                 opt_rounds=4, iters_per_round=10, pattern="learned"):
        self.cam = cam
        self.frontend = OrbFrontend.shared(
            rows=cam.rows, cols=cam.cols, max_keypts=max_keypts,
            num_levels=num_levels, scale_factor=scale_factor,
            ini_fast_thr=ini_fast_thr, min_fast_thr=min_fast_thr,
            pattern=pattern,
        )
        self.lm_capacity = lm_capacity
        self.num_levels = num_levels
        self.scale_factors = jnp.asarray(
            [scale_factor**l for l in range(num_levels)], jnp.float32
        )
        self.sigma2 = self.scale_factors**2
        # XLA LM core: composable under vmap (see module docstring)
        self._pose_core = make_pose_optimizer(
            cam, stereo=False, num_rounds=opt_rounds,
            iters_per_round=iters_per_round, jit=False, allow_pallas=False,
        )
        self.step = jax.jit(self._step_impl)

    def example_args(self, batch=4, seed=0):
        rng = np.random.default_rng(seed)
        b = batch
        imgs = rng.integers(0, 255, (b, self.cam.rows, self.cam.cols), np.uint8)
        L = self.lm_capacity
        T_pred = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        lm_pos = jnp.asarray(
            rng.standard_normal((b, L, 3)) * 2 + np.array([0, 0, 6]), jnp.float32)
        lm_desc = jnp.asarray(rng.integers(0, 2, (b, L, 256)), jnp.int8)
        lm_valid = jnp.ones((b, L), bool)
        lm_lvl = jnp.zeros((b, L), jnp.int32)
        return (jnp.asarray(imgs), T_pred, lm_pos, lm_desc, lm_valid, lm_lvl)

    def _one_stream(self, kp_xy, kp_desc_i8, kp_level, kp_valid,
                    T_pred, lm_pos, lm_desc_i8, lm_valid, lm_pred_level):
        # shared with FrameStep (models.frame_step.match_and_optimize);
        # use_pallas=False because the matcher kernel cannot be vmapped
        return match_and_optimize(
            self.cam, self.num_levels, self.scale_factors, self.sigma2,
            self._pose_core, kp_xy, kp_desc_i8, kp_level, kp_valid,
            T_pred, lm_pos, lm_desc_i8, lm_valid, lm_pred_level,
            use_pallas=False,
        )

    def _step_impl(self, images_u8, T_pred, lm_pos, lm_desc_i8, lm_valid,
                   lm_pred_level):
        kp = self.frontend._extract_batch_impl(images_u8, None)
        T, inl, idx = jax.vmap(self._one_stream)(
            kp.xy, kp.desc_i8, kp.level, kp.valid,
            T_pred, lm_pos, lm_desc_i8, lm_valid, lm_pred_level,
        )
        return BatchStepResult(T, inl, kp.xy, kp.valid, idx, kp.desc_u32)
