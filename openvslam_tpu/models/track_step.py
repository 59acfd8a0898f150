"""Fused per-frame tracking step for the LIVE pipeline: ONE jitted program
covering the common tracking path of the reference's tracking_module
(SURVEY.md §3.2) —

  extract (pyramid+FAST+rBRIEF)
  -> motion-model projection match vs the last frame's landmarks
     (radius 7, auto-widened to 14 when thin — both gates share the step)
  -> pose-only LM (4x10, Huber, inlier reclassification)
  -> local-map projection match (scale-predicted radius, stage-1 kpts masked)
  -> pose-only LM again
  -> per-keypoint source slot + inlier mask

Per frame the host uploads one image + the pose prediction and downloads the
keypoint SoA + two small vectors; the 6 separate device calls of the unfused
path (extract, match, opt, predict, match, opt) collapse into one XLA
program.  Fallback ladders (BoW/robust/reloc) remain host-driven in
module.tracking_module and reuse the downloaded keypoints.

The local-map and last-frame tables may contain the same physical landmark;
`loc_prev_slot` maps local slots to last-frame slots so stage 2 excludes
landmarks already matched in stage 1 (exact dedup, same as the host loop).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..optimize.pose_optimizer import make_pose_optimizer
from . import tracking_ops as TO
from .frontend import OrbFrontend


def unpack_bits_host(desc_u32: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """(K,8) u32 -> (K,256) int8 on the HOST (numpy) — downloading 32 B/kpt
    and unpacking beats shipping the 256 B/kpt unpacked form through the
    host<->device link (matches ops.orb.unpack_bits_i8 bit order; invalid
    rows zeroed like the frontend does)."""
    bits = ((desc_u32[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1)
    out = bits.reshape(desc_u32.shape[0], -1).astype(np.int8)
    out[~valid] = 0
    return out


class TrackStepResult(NamedTuple):
    # keypoint SoA (download once, build data.Frame without re-deriving)
    kp_xy: jnp.ndarray          # (K,2)
    kp_und: jnp.ndarray         # (K,2)
    kp_bearing: jnp.ndarray     # (K,3)
    kp_level: jnp.ndarray       # (K,)
    kp_angle: jnp.ndarray       # (K,)
    kp_response: jnp.ndarray    # (K,)
    kp_desc_u32: jnp.ndarray    # (K,8) — desc_i8 is reconstructed on host
    kp_valid: jnp.ndarray       # (K,)
    kp_x_right: jnp.ndarray     # (K,) stereo/RGBD right-u (-1 = mono obs)
    kp_depth: jnp.ndarray       # (K,) stereo/RGBD depth (-1 = unknown)
    # association: slot in the combined landmark table per keypoint
    # (-1 none, [0,P) last-frame slot, [P,P+L) local-map slot)
    kp_src: jnp.ndarray         # (K,) i32
    kp_inlier: jnp.ndarray      # (K,) bool (final LM inliers)
    n_stage1: jnp.ndarray       # () i32 inliers after the motion-match LM
    T_cw: jnp.ndarray           # (4,4) final pose
    num_inliers: jnp.ndarray    # () i32
    loc_visible: jnp.ndarray    # (L,) bool — local lms projected in-frame


class TrackStep:
    """Build once per (camera, frontend geometry, capacities); jit-compiled
    on first call.

    mode: "mono" (default), "stereo" (aux operand = right gray image;
    extracts both views and row-matches in-program, pose LM carries
    (u, v, u_right) stereo observations), or "rgbd" (aux operand = metric
    depth map f32; depth sampled at keypoints on device, virtual right-u).
    """

    def __init__(self, cam, frontend: OrbFrontend, lm_capacity: int = 4096,
                 mode: str = "mono"):
        assert mode in ("mono", "stereo", "rgbd"), mode
        self.cam = cam
        self.frontend = frontend
        self.lm_capacity = lm_capacity
        self.mode = mode
        self.prev_capacity = frontend.capacity
        self.num_levels = frontend.num_levels
        sf = frontend.scale_factor
        self.scale_factors = jnp.asarray(
            [sf**l for l in range(self.num_levels)], jnp.float32)
        self.sigma2 = self.scale_factors**2
        self.log_scale = float(np.log(sf))
        self._pose_core = make_pose_optimizer(
            cam, stereo=mode != "mono", jit=False)
        self.step = jax.jit(self._impl)

    _shared_cache: dict = {}

    @classmethod
    def shared(cls, cam, frontend: OrbFrontend, lm_capacity: int = 4096,
               mode: str = "mono") -> "TrackStep":
        """Process-wide instance cache keyed by the camera's serialized spec
        + frontend identity + capacities.  A TrackStep is stateless, so
        Systems with equal cameras/feature settings share one compiled
        program instead of re-jitting per session (a full remote compile on
        tunnel-attached TPUs)."""
        from ..camera.base import camera_to_config
        spec = tuple(sorted(camera_to_config(cam).items()))
        fe = (frontend.rows, frontend.cols, frontend.capacity,
              frontend.num_levels, frontend.scale_factor,
              frontend.ini_fast_thr, frontend.min_fast_thr, frontend.cell,
              frontend.pattern)
        key = (spec, fe, lm_capacity, mode)
        inst = cls._shared_cache.get(key)
        if inst is None:
            inst = cls(cam, frontend, lm_capacity, mode)
            cls._shared_cache[key] = inst
        return inst

    def _impl(self, image_u8, mask, T_pred,
              prev_pos, prev_desc_u32, prev_valid, prev_level,
              loc_pos, loc_desc, loc_valid, loc_maxd, loc_prev_slot,
              aux=None):
        from ..ops import orb
        cam = self.cam
        P = self.prev_capacity
        # last-frame descriptors ride packed (32 B/landmark up the tunnel)
        prev_desc = jnp.where(
            prev_valid[:, None], orb.unpack_bits_i8(prev_desc_u32), 0)
        kp = self.frontend._extract_impl(image_u8, mask)
        und = cam.undistort_keypoints(kp.xy)
        brg = cam.keypoints_to_bearings(kp.xy)
        K = kp.xy.shape[0]
        sig2 = self.sigma2[jnp.clip(kp.level, 0, self.num_levels - 1)]

        # stereo/RGBD: per-keypoint right-u + depth, in-program
        x_right = jnp.full((K,), -1.0, jnp.float32)
        depth = jnp.full((K,), -1.0, jnp.float32)
        if self.mode == "stereo":
            from ..ops.stereo import stereo_match_dense
            x_right, depth = stereo_match_dense(
                image_u8, aux, kp.xy, kp.valid,
                jnp.float32(cam.focal_x_baseline),
            )
        elif self.mode == "rgbd":
            u = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0,
                         cam.cols - 1)
            v = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0,
                         cam.rows - 1)
            z = aux[v, u]
            ok_z = (z > 1e-3) & jnp.isfinite(z) & kp.valid
            depth = jnp.where(ok_z, z, -1.0)
            x_right = jnp.where(
                ok_z,
                kp.xy[:, 0] - cam.focal_x_baseline / jnp.maximum(z, 1e-6),
                -1.0,
            )

        # ---- stage 1: motion-model match (radius 7 -> widen to 14) -------
        def motion_match(radius):
            idx, dist, _ = TO.match_landmarks_by_projection(
                cam, T_pred, prev_pos, prev_desc, prev_valid,
                kp.desc_i8, und, kp.valid, kp.level,
                jnp.float32(radius), self.scale_factors, prev_level,
            )
            return idx

        idx_a = motion_match(7.0)
        n_a = jnp.sum((idx_a >= 0).astype(jnp.int32))
        idx_b = motion_match(14.0)
        idx1 = jnp.where(n_a >= 20, idx_a, idx_b)

        # per-keypoint slot into the last-frame table (OOB scatter = drop)
        kpt1 = jnp.where(idx1 >= 0, idx1, K)
        kp_lm1 = jnp.full((K,), -1, jnp.int32).at[kpt1].set(
            jnp.arange(P, dtype=jnp.int32), mode="drop")

        # stereo modes: (u, v, u_right) observations (u_right<0 = mono obs)
        obs = und if self.mode == "mono" else jnp.concatenate(
            [und, x_right[:, None]], 1)

        has1 = kp_lm1 >= 0
        X1 = prev_pos[jnp.clip(kp_lm1, 0)]
        res1 = self._pose_core(T_pred, X1, obs, sig2, has1)
        # drop outlier associations before the local-map search (host parity)
        kp_lm1 = jnp.where(res1.inliers, kp_lm1, -1)
        prev_matched = jnp.zeros((P,), bool).at[
            jnp.where(kp_lm1 >= 0, kp_lm1, P)].set(True, mode="drop")

        # ---- stage 2: local-map match around the stage-1 pose ------------
        pred_lvl = TO.predict_scale_levels(
            loc_pos, res1.T_cw, loc_maxd,
            jnp.int32(self.num_levels), jnp.float32(self.log_scale))
        # exclude local lms already matched via their last-frame alias
        alias_hit = (loc_prev_slot >= 0) & prev_matched[
            jnp.clip(loc_prev_slot, 0)]
        loc_ok = loc_valid & ~alias_hit
        kpt_free = kp.valid & (kp_lm1 < 0)
        n_seeds = jnp.sum((kp_lm1 >= 0).astype(jnp.int32))
        radius = jnp.where(n_seeds >= 50, 4.0, 9.0).astype(jnp.float32)
        idx2, dist2, vis2 = TO.match_landmarks_by_projection(
            cam, res1.T_cw, loc_pos, loc_desc, loc_ok,
            kp.desc_i8, und, kpt_free, kp.level,
            radius, self.scale_factors, pred_lvl,
        )
        L = loc_pos.shape[0]
        kpt2 = jnp.where(idx2 >= 0, idx2, K)
        kp_lm2 = jnp.full((K,), -1, jnp.int32).at[kpt2].set(
            jnp.arange(L, dtype=jnp.int32) + P, mode="drop")
        # stage-1 association wins where both exist (host loop parity)
        kp_src = jnp.where(kp_lm1 >= 0, kp_lm1, kp_lm2)

        # ---- final pose LM over the combined association set -------------
        is_prev = (kp_src >= 0) & (kp_src < P)
        Xc = jnp.where(
            is_prev[:, None],
            prev_pos[jnp.clip(kp_src, 0, P - 1)],
            loc_pos[jnp.clip(kp_src - P, 0, L - 1)],
        )
        res2 = self._pose_core(res1.T_cw, Xc, obs, sig2, kp_src >= 0)

        return TrackStepResult(
            kp_xy=kp.xy, kp_und=und, kp_bearing=brg, kp_level=kp.level,
            kp_angle=kp.angle, kp_response=kp.response,
            kp_desc_u32=kp.desc_u32, kp_valid=kp.valid,
            kp_x_right=x_right, kp_depth=depth,
            kp_src=kp_src, kp_inlier=res2.inliers,
            n_stage1=res1.num_inliers,
            T_cw=res2.T_cw, num_inliers=res2.num_inliers,
            loc_visible=vis2,
        )
