"""Relocalizer (ref ``module/relocalizer``): recover the pose when Lost.

BoW candidates -> word-gated descriptor match vs candidate KF landmarks ->
batched PnP RANSAC on bearings -> pose-only LM -> projection-widened match ->
accept above the inlier gate (~50).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import tracking_ops as TO
from ..ops import bow as bow_ops
from ..ops import match as M
from ..ops import orb as orb_ops
from ..ops import ransac, solvers
from ..optimize.pose_optimizer import make_pose_optimizer


@functools.partial(jax.jit, static_argnames=("n_hyp",))
def _reloc_stage1(key, d_f, v_f, brg_f, words_f,
                  kf_desc_u32, kf_words, kf_ok, kf_pts, n_hyp=128):
    """Stage 1 of relocalization for ALL BoW candidates in ONE program:
    word-gated descriptor match + EPnP RANSAC per candidate, vmapped over
    the candidate axis.  The per-candidate host loop cost ~2 device round
    trips per candidate (most of which fail the match/PnP gates anyway).

    kf_desc_u32 (C,Kf,8) ride packed (32 B/kpt up the link); kf_ok marks
    candidate keypoints with a LIVE landmark; kf_pts are those landmarks'
    positions.  Returns per candidate: idx (C,K) frame-kpt -> kf-kpt match,
    n_match (C,), T_est (C,4,4), n_inl (C,).
    """
    C = kf_words.shape[0]
    keys = jax.random.split(key, C)

    def one(kk, desc_u32, wds, ok, pts):
        desc = jnp.where(ok[:, None], orb_ops.unpack_bits_i8(desc_u32), 0)
        gate = bow_ops.word_gate(words_f, wds)
        idx, dist = M.match_descriptors(
            d_f, desc, v_f, ok, gate=gate,
            max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9, cross_check=True,
        )
        pair_ok = idx >= 0
        P = pts[jnp.clip(idx, 0)]
        n_match = jnp.sum(pair_ok.astype(jnp.int32))
        T_est, score, inl = ransac.run_ransac(
            kk,
            lambda i: solvers.fit_pnp_epnp(brg_f[i], P[i]),
            lambda T: solvers.score_pnp(T, brg_f, P, pair_ok,
                                        thr_cos=0.9998),
            pair_ok, n_hyp, 4,
        )
        n_inl = jnp.sum((inl & pair_ok).astype(jnp.int32))
        return idx, n_match, T_est, n_inl

    return jax.vmap(one)(keys, kf_desc_u32, kf_words, kf_ok, kf_pts)


RELOC_CAND_CAP = 16   # fixed stage-1 candidate padding (>= the BoW cap of 10)


class Relocalizer:
    def __init__(self, cfg, cam, map_db, bow_db, min_inliers: int = 40):
        self.cfg = cfg
        self.cam = cam
        self.db = map_db
        self.bow_db = bow_db
        self.min_inliers = min_inliers
        self.pose_opt = make_pose_optimizer(cam)
        nl = cfg.feature.num_levels
        sf = cfg.feature.scale_factor
        self.scale_factors = np.array([sf**l for l in range(nl)], np.float32)
        self.sigma2 = self.scale_factors**2
        self.num_levels = nl
        self.key = jax.random.PRNGKey(17)

    def prewarm(self, K: int):
        """Compile stage 1 at the fixed candidate padding with dummy data —
        the first real mid-run relocalization then pays no compile inside
        the tracking loop.  Run on the background prewarm thread."""
        key = jax.random.PRNGKey(0)
        words = np.zeros(K, np.int32)
        _reloc_stage1(
            key, jnp.zeros((K, 256), jnp.int8), jnp.zeros(K, bool),
            jnp.zeros((K, 3), jnp.float32),
            jnp.asarray(self.bow_db.gate_words(words)),
            jnp.zeros((RELOC_CAND_CAP, K, 8), jnp.uint32),
            jnp.zeros((RELOC_CAND_CAP, K), jnp.int32),
            jnp.zeros((RELOC_CAND_CAP, K), bool),
            jnp.zeros((RELOC_CAND_CAP, K, 3), jnp.float32),
        )[1].block_until_ready()

    def relocalize(self, frame,
                   min_inliers: Optional[int] = None) -> Optional[np.ndarray]:
        """``min_inliers`` overrides the acceptance gate for this call (the
        tracker's post-loss grace window lowers it, paired with its own
        spatial-proximity guard — see TrackingModule._relocalize)."""
        gate = self.min_inliers if min_inliers is None else int(min_inliers)
        words = self.bow_db.compute_words(frame.desc_i8, frame.valid)
        cands = self.bow_db.acquire_relocalization_candidates(words)
        if not cands:
            return None
        db = self.db
        # FIXED candidate-axis padding: acquire_relocalization_candidates
        # caps at 10, so one static shape covers every call — the first
        # mid-run relocalization must not pay a fresh bucket compile inside
        # the tracking loop (r3 city run: 36 s max_track_ms was this), and a
        # constant shape is prewarmable at startup.  The vmapped overpadding
        # costs device compute only (~ms), never a compile.
        C = len(cands)
        Cp = RELOC_CAND_CAP if C <= RELOC_CAND_CAP else \
            1 << int(np.ceil(np.log2(C)))
        padded = list(cands) + [cands[0]] * (Cp - C)
        Kf = db.kf_desc_u32[int(cands[0])].shape[0]
        kf_desc = np.zeros((Cp, Kf, 8), np.uint32)
        kf_words = np.zeros((Cp, Kf), np.int32)
        kf_ok = np.zeros((Cp, Kf), bool)
        kf_pts = np.zeros((Cp, Kf, 3), np.float32)
        for ci, kf in enumerate(padded):
            kf = int(kf)
            arr = db.kf_lm_idx[kf]
            ok = (arr >= 0) & db.kf_kpt_valid[kf] \
                & db.lm_valid[np.clip(arr, 0, None)]
            kf_desc[ci] = db.kf_desc_u32[kf]
            kf_words[ci] = self.bow_db.gate_words(self.bow_db.kf_words[kf])
            kf_ok[ci] = ok
            kf_pts[ci][ok] = db.lm_pos[arr[ok]]
        self.key, k = jax.random.split(self.key)
        idx_all, n_match, T_all, n_inl = jax.device_get(_reloc_stage1(
            k, jnp.asarray(frame.desc_i8), jnp.asarray(frame.valid),
            jnp.asarray(frame.bearing),
            jnp.asarray(self.bow_db.gate_words(words)),
            jnp.asarray(kf_desc), jnp.asarray(kf_words),
            jnp.asarray(kf_ok), jnp.asarray(kf_pts),
        ))
        # candidates in BoW-rank order; first to survive all gates wins
        # (the reference's sequential semantics)
        for ci, kf in enumerate(cands):
            if int(n_match[ci]) < 15 or int(n_inl[ci]) < 10:
                continue
            T = self._refine_candidate(
                frame, int(kf), idx_all[ci], kf_ok[ci],
                T_all[ci].astype(np.float32), gate)
            if T is not None:
                # tracker adopts this as its reference keyframe (ref:
                # relocalization re-anchors tracking on the matched KF)
                self.last_reloc_kf = int(kf)
                return T
        return None

    def _refine_candidate(self, frame, kf: int, idx, kf_ok, T_est,
                          gate: int) -> Optional[np.ndarray]:
        """Stage 2 for one surviving candidate: pose LM on the matches,
        projection-widened match over the candidate's local map, final LM."""
        db = self.db
        m_f = np.where((idx >= 0) & kf_ok[np.clip(idx, 0, None)])[0]
        lm_ids = db.kf_lm_idx[kf][idx[m_f]]

        # associate matched landmarks and optimize the pose
        frame.lm_idx[:] = -1
        frame.lm_idx[m_f] = lm_ids
        T_opt, num_inl = self._pose_optimize(frame, T_est)
        if num_inl < 10:
            frame.lm_idx[:] = -1
            return None
        # projection widen: match all landmarks of the candidate's local map
        local_kfs = [kf] + db.get_top_covisible(kf, 10)
        lm_set = set()
        for k2 in local_kfs:
            arr = db.kf_lm_idx[k2]
            for lm in arr[arr >= 0]:
                if db.lm_valid[lm]:
                    lm_set.add(int(lm))
        cand_lms = np.array(sorted(lm_set), np.int64)
        Lcap = 4096
        n2 = min(len(cand_lms), Lcap)
        pos = np.zeros((Lcap, 3), np.float32)
        desc = np.zeros((Lcap, 256), np.int8)
        valid = np.zeros(Lcap, bool)
        pos[:n2] = db.lm_pos[cand_lms[:n2]]
        desc[:n2] = db.lm_desc_i8[cand_lms[:n2]]
        valid[:n2] = True
        pred = np.full(Lcap, -1, np.int32)
        idx2, dist2, vis2 = TO.match_landmarks_by_projection(
            self.cam, jnp.asarray(T_opt, jnp.float32), jnp.asarray(pos),
            jnp.asarray(desc), jnp.asarray(valid),
            jnp.asarray(frame.desc_i8), jnp.asarray(frame.xy_undist),
            jnp.asarray(frame.valid), jnp.asarray(frame.level),
            jnp.float32(10.0), jnp.asarray(self.scale_factors),
            jnp.asarray(pred),
        )
        idx2 = np.asarray(idx2)
        for j in np.where(idx2 >= 0)[0]:
            if j >= n2:
                continue
            kpt = int(idx2[j])
            if frame.lm_idx[kpt] < 0:
                frame.lm_idx[kpt] = cand_lms[j]
        T_fin, num_inl = self._pose_optimize(frame, T_opt)
        if num_inl < gate:
            frame.lm_idx[:] = -1
            return None
        frame.lm_idx[frame.outlier] = -1
        frame.outlier[:] = False
        return T_fin

    def _pose_optimize(self, frame, T_init):
        obs_mask = (frame.lm_idx >= 0) & frame.valid
        lm = np.clip(frame.lm_idx, 0, None)
        X = self.db.lm_pos[lm]
        sigma2 = self.sigma2[np.clip(frame.level, 0, self.num_levels - 1)]
        res = self.pose_opt(
            jnp.asarray(T_init, jnp.float32), jnp.asarray(X),
            jnp.asarray(frame.xy_undist), jnp.asarray(sigma2),
            jnp.asarray(obs_mask),
        )
        inl = np.asarray(res.inliers)
        frame.outlier = obs_mask & ~inl
        return np.asarray(res.T_cw), int(res.num_inliers)
