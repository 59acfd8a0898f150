"""Relocalizer (ref ``module/relocalizer``): recover the pose when Lost.

BoW candidates -> word-gated descriptor match vs candidate KF landmarks ->
batched PnP RANSAC on bearings -> pose-only LM -> projection-widened match ->
accept above the inlier gate (~50).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import tracking_ops as TO
from ..ops import bow as bow_ops
from ..ops import match as M
from ..ops import ransac, solvers
from ..optimize.pose_optimizer import make_pose_optimizer


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

    def relocalize(self, frame) -> Optional[np.ndarray]:
        words = self.bow_db.compute_words(frame.desc_i8, frame.valid)
        cands = self.bow_db.acquire_relocalization_candidates(words)
        for kf in cands:
            T = self._try_candidate(frame, words, kf)
            if T is not None:
                # tracker adopts this as its reference keyframe (ref:
                # relocalization re-anchors tracking on the matched KF)
                self.last_reloc_kf = int(kf)
                return T
        return None

    def _try_candidate(self, frame, words, kf) -> Optional[np.ndarray]:
        db = self.db
        kf_words = self.bow_db.kf_words[kf]
        kf_has_lm = (db.kf_lm_idx[kf] >= 0) & db.kf_kpt_valid[kf]
        gate = bow_ops.word_gate(jnp.asarray(words), jnp.asarray(kf_words))
        idx, dist = M.match_descriptors(
            jnp.asarray(frame.desc_i8), jnp.asarray(db.kf_desc_i8[kf]),
            jnp.asarray(frame.valid), jnp.asarray(kf_has_lm),
            gate=gate, max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9,
            cross_check=True,
        )
        idx = np.asarray(idx)
        m_f = np.where(idx >= 0)[0]
        if len(m_f) < 15:
            return None
        lm_ids = db.kf_lm_idx[kf][idx[m_f]]
        good = np.array([l >= 0 and db.lm_valid[l] for l in lm_ids])
        m_f = m_f[good]
        lm_ids = lm_ids[good]
        if len(m_f) < 15:
            return None

        K = frame.capacity
        brg = np.zeros((K, 3), np.float32)
        brg[:, 2] = 1.0
        pts = np.zeros((K, 3), np.float32)
        pmask = np.zeros(K, bool)
        n = len(m_f)
        brg[:n] = frame.bearing[m_f]
        pts[:n] = db.lm_pos[lm_ids]
        pmask[:n] = True
        self.key, k = jax.random.split(self.key)
        bj, pj, mj = jnp.asarray(brg), jnp.asarray(pts), jnp.asarray(pmask)
        # EPnP on 4-point minimal sets (ref pnp_solver): at 50% outliers an
        # all-inlier quadruple is ~4x likelier than an all-inlier 6-set
        T_est, score, inl = ransac.run_ransac(
            k,
            lambda i: solvers.fit_pnp_epnp(bj[i], pj[i]),
            lambda T: solvers.score_pnp(T, bj, pj, mj, thr_cos=0.9998),
            mj, 128, 4,
        )
        if int(np.asarray(inl).sum()) < 10:
            return None

        # associate matched landmarks and optimize the pose
        frame.lm_idx[:] = -1
        frame.lm_idx[m_f] = lm_ids
        T_opt, num_inl = self._pose_optimize(frame, np.asarray(T_est))
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
        if num_inl < self.min_inliers:
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
