"""Loop detector (ref ``module/loop_detector``): BoW candidates gated by the
covisibility min-score, continuity check over consecutive keyframes, then
Sim3 validation (word-gated match -> Horn RANSAC -> Sim3 refine -> projection
widen -> inlier gate).
"""
from __future__ import annotations

from typing import List, Set, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import bow as bow_ops
from ..ops import match as M
from ..ops import ransac, solvers
from ..optimize.sim3_transform import make_sim3_transform_optimizer

import functools


@functools.partial(jax.jit, static_argnames=("max_dist",))
def _batch_first_stage_counts(bits_k, has_k, words_k,
                              bits_cs, has_cs, words_cs,
                              max_dist: int):
    """First validation stage for ALL candidates of one keyframe in ONE
    device call: word-gated cross-checked matching of kf against each
    candidate, returning per-candidate match counts.  Perceptual aliasing
    makes the BoW stage candidate-happy (city run: candidates on 180 of
    190 checked keyframes); paying one link round trip per candidate
    drowned the loop worker ~200 keyframes behind the mapper.  The gate is
    built in-kernel from the word ids ((C,M) int32 upload, not the (C,N,M)
    bool gate)."""
    def one(bits_c, has_c, words_c):
        gate = bow_ops.word_gate(words_k, words_c)
        idx, _ = M.match_descriptors(
            bits_k, bits_c, has_k, has_c, gate=gate,
            max_dist=max_dist, ratio=0.9, cross_check=True)
        return jnp.sum(idx >= 0)
    return jax.vmap(one)(bits_cs, has_cs, words_cs)


class LoopDetector:
    def __init__(self, cfg, cam, map_db, bow_db, fix_scale: bool = False):
        self.cfg = cfg
        self.cam = cam
        self.db = map_db
        self.bow_db = bow_db
        self.fix_scale = fix_scale
        self.cont_groups: List[Tuple[Set[int], int]] = []   # (group KFs, chain len)
        self.sim3_opt = make_sim3_transform_optimizer(cam, fix_scale=fix_scale)
        self.key = jax.random.PRNGKey(23)
        self.min_continuity = cfg.loop.min_continuity

    # ------------------------------------------------------------------
    def detect(self, kf: int) -> List[int]:
        """Returns continuity-validated loop candidates for keyframe kf."""
        db = self.db
        covis = db.get_top_covisible(kf, 30)
        if not covis:
            self.cont_groups = []
            return []
        scores = [self.bow_db.score(kf, c) for c in covis
                  if c in self.bow_db.kf_bow]
        if not scores:
            # none of kf's covisibles are registered yet (worker-side BoW
            # registration lags covis updates by the queue depth) — no
            # reference score to gate against this round
            self.cont_groups = []
            return []
        min_score = min(scores)
        connected = set(covis) | {kf}
        cands = self.bow_db.acquire_loop_candidates(kf, min_score, connected)
        if not cands:
            self.cont_groups = []
            return []
        # continuity: a candidate's group must intersect a previous group
        validated = []
        new_groups: List[Tuple[Set[int], int]] = []
        for cand in cands:
            group = set([cand] + db.get_top_covisible(cand, 10))
            chain = 0
            for prev_group, prev_chain in self.cont_groups:
                if group & prev_group:
                    chain = max(chain, prev_chain + 1)
            new_groups.append((group, chain))
            if chain >= self.min_continuity - 1:
                validated.append(cand)
        self.cont_groups = new_groups
        return validated

    # ------------------------------------------------------------------
    def snapshot(self, kf: int, cand: int) -> dict:
        """Copy everything Sim3 validation reads from the map for the pair
        (kf, cand) — per-keyframe keypoint columns, per-slot landmark
        positions/validity, poses, BoW words.  Taken under the map lock by
        the loop worker so ``validate_snapshot`` can run its device-heavy
        pipeline WITHOUT holding the lock (the reference's loop detector
        runs on its own thread with fine-grained locking; here the snapshot
        plus a geom_version check at correction time gives the same
        isolation with one lock acquisition)."""
        db = self.db
        snap = {"kf": kf, "cand": cand, "geom_version": db.geom_version}
        for tag, k in (("k", kf), ("c", cand)):
            if k not in self.bow_db.kf_words:   # compute on demand (init KFs)
                w = self.bow_db.compute_words(db.kf_desc_i8[k],
                                              db.kf_kpt_valid[k])
                self.bow_db.add_keyframe(k, w)
            lm_idx = db.kf_lm_idx[k].copy()
            lmc = np.clip(lm_idx, 0, db.n_lms - 1)
            snap[tag] = {
                "desc": db.kf_desc_i8[k],          # immutable once stored
                "und": db.kf_xy_undist[k],
                "level": db.kf_level[k].astype(np.int32),
                "kpt_valid": db.kf_kpt_valid[k],
                "lm_idx": lm_idx,
                "lmok": (lm_idx >= 0) & db.lm_valid[lmc],
                "X": db.lm_pos[lmc].copy(),        # per-slot world position
                "pose": db.kf_pose_cw[k].copy(),
                "words": self.bow_db.gate_words(self.bow_db.kf_words[k]),
            }
        return snap

    def validate(self, kf: int, cand: int, min_inliers: int = 20):
        """Sim3 validation: returns (R, t, s) of T_cur<-cand (candidate camera
        coords -> current camera coords) and matched lm pairs, or None.
        Convenience wrapper: snapshot + validate_snapshot in one call (the
        async loop worker splits them around the map lock)."""
        return self.validate_snapshot(self.snapshot(kf, cand), min_inliers)

    def prefilter_counts(self, snaps: List[dict]) -> np.ndarray:
        """First-stage match counts for a batch of (kf, cand) snapshots of
        the SAME kf, in one device call — exactly the count that
        validate_snapshot gates on min_num_bow_matches, so candidates that
        fail here would fail there; only survivors pay the full per-pair
        validation.  Candidate axis padded to a power-of-2 bucket."""
        if not snaps:
            return np.zeros(0, np.int32)
        sk = snaps[0]["k"]
        bits_k = sk["desc"]
        has_k = sk["lmok"] & sk["kpt_valid"]
        words_k = sk["words"]
        C = len(snaps)
        cap = 1 << int(np.ceil(np.log2(max(C, 1))))
        shp = snaps[0]["c"]["desc"].shape
        bits_cs = np.zeros((cap,) + shp, snaps[0]["c"]["desc"].dtype)
        has_cs = np.zeros((cap, shp[0]), bool)
        words_cs = np.full((cap, len(words_k)), -1,
                           np.asarray(words_k).dtype)
        for i, s in enumerate(snaps):
            sc = s["c"]
            bits_cs[i] = sc["desc"]
            has_cs[i] = sc["lmok"] & sc["kpt_valid"]
            words_cs[i] = sc["words"]
        counts = _batch_first_stage_counts(
            jnp.asarray(bits_k), jnp.asarray(has_k), jnp.asarray(words_k),
            jnp.asarray(bits_cs), jnp.asarray(has_cs),
            jnp.asarray(words_cs), M.HAMMING_DIST_THR_LOW)
        return np.asarray(counts)[:C]

    def validate_snapshot(self, snap: dict, min_inliers: int = 20):
        sk, sc = snap["k"], snap["c"]
        has_lm_k = sk["lmok"] & sk["kpt_valid"]
        has_lm_c = sc["lmok"] & sc["kpt_valid"]
        gate = bow_ops.word_gate(
            jnp.asarray(sk["words"]), jnp.asarray(sc["words"]))
        idx, dist = M.match_descriptors(
            jnp.asarray(sk["desc"]), jnp.asarray(sc["desc"]),
            jnp.asarray(has_lm_k), jnp.asarray(has_lm_c),
            gate=gate, max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9,
            cross_check=True,
        )
        idx = np.asarray(idx)
        mk = np.where(idx >= 0)[0]
        if len(mk) < self.cfg.loop.min_num_bow_matches:
            return None
        mc = idx[mk]
        ok = has_lm_k[mk] & has_lm_c[mc]
        mk, mc = mk[ok], mc[ok]
        lms_k = sk["lm_idx"][mk]
        lms_c = sc["lm_idx"][mc]
        n = len(mk)
        if n < self.cfg.loop.min_num_bow_matches:
            return None

        T_k = snap["k"]["pose"]
        T_c = snap["c"]["pose"]
        pk = (T_k[:3, :3] @ sk["X"][mk].T).T + T_k[:3, 3]   # in cur cam
        pc = (T_c[:3, :3] @ sc["X"][mc].T).T + T_c[:3, 3]   # in cand cam

        cap = max(64, 1 << int(np.ceil(np.log2(max(n, 2)))))
        p1 = np.zeros((cap, 3), np.float32)
        p2 = np.zeros((cap, 3), np.float32)
        pmask = np.zeros(cap, bool)
        p1[:n] = pc          # candidate-frame coords (source)
        p2[:n] = pk          # current-frame coords (target)
        pmask[:n] = True
        self.key, k = jax.random.split(self.key)
        p1j, p2j, mj = jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(pmask)
        # RANSAC over Horn 3-point fits; threshold scaled by scene depth
        med_depth = float(np.median(pk[:, 2])) if n else 1.0
        thr = (0.05 * med_depth) ** 2
        g, score, inl = ransac.run_ransac(
            k,
            lambda i: solvers.fit_sim3_horn(p1j[i], p2j[i], fix_scale=self.fix_scale),
            lambda g: solvers.score_sim3(g, p1j, p2j, mj, thr),
            mj, 128, 3,
        )
        if int(np.asarray(inl).sum()) < 10:
            return None

        # Sim3-warped projection widening, BOTH directions (ref
        # validate_candidates: match::projection with the RANSAC Sim3 before
        # the transform optimization) — BoW matching misses pairs whose
        # words drifted; the warped projection search recovers them, so the
        # full inlier gate below is reachable on true loops and false loops
        # cannot ride a handful of aliased BoW hits.
        g_np = (np.asarray(g[0]), np.asarray(g[1]), float(np.asarray(g[2])))
        add_k, add_c = self._widen_matches(
            snap, g_np, set(int(i) for i in mk), set(int(i) for i in mc))
        if len(add_k):
            mk = np.concatenate([mk, add_k])
            mc = np.concatenate([mc, add_c])
            lms_k = sk["lm_idx"][mk]
            lms_c = sc["lm_idx"][mc]
            n = len(mk)
            pk = (T_k[:3, :3] @ sk["X"][mk].T).T + T_k[:3, 3]
            pc = (T_c[:3, :3] @ sc["X"][mc].T).T + T_c[:3, 3]
            cap = max(64, 1 << int(np.ceil(np.log2(max(n, 2)))))
            p1 = np.zeros((cap, 3), np.float32)
            p2 = np.zeros((cap, 3), np.float32)
            pmask = np.zeros(cap, bool)
            p1[:n] = pc
            p2[:n] = pk
            pmask[:n] = True
            p1j, p2j, mj = jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(pmask)

        # refine with mutual reprojection (uses keypoint observations)
        uv1 = np.zeros((cap, 2), np.float32)
        uv2 = np.zeros((cap, 2), np.float32)
        s2_1 = np.ones(cap, np.float32)
        s2_2 = np.ones(cap, np.float32)
        uv1[:n] = sk["und"][mk]
        uv2[:n] = sc["und"][mc]
        sf = self.cfg.feature.scale_factor
        s2_1[:n] = (sf ** sk["level"][mk]) ** 2
        s2_2[:n] = (sf ** sc["level"][mc]) ** 2
        res = self.sim3_opt(
            g[0], g[1], g[2],
            p2j, p1j,                     # lm1 = cur-frame coords, lm2 = cand
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(s2_1), jnp.asarray(s2_2), mj,
        )
        if int(res.num_inliers) < min_inliers:
            return None
        return (np.asarray(res.R), np.asarray(res.t), float(res.s),
                mk, mc, lms_k, lms_c)

    # ------------------------------------------------------------------
    def _widen_matches(self, snap, g, taken_k, taken_c,
                       radius_base: float = 8.0):
        """Sim3-guided projection search in both directions (ref
        match::projection in validate_candidates / ORB-SLAM SearchBySim3):
        project cand's landmarks into kf via g=S(cur<-cand) and kf's
        landmarks into cand via g^-1, match descriptors within a
        scale-dependent radius, and keep MUTUALLY consistent new pairs.
        Both sides of a pair must carry a landmark (the transform optimizer
        needs positions in both frames).  Returns (new_k_idx, new_c_idx)
        keypoint-slot arrays.  Fixed (K_kf, K_cand) shapes — one compile per
        keyframe capacity, not per call.  Operates on the loop snapshot (no
        live-map reads: may run off the map lock)."""
        R, t, s = g
        sf = self.cfg.feature.scale_factor

        def project_dir(src, dst, Rg, tg, sg, taken_src):
            """Project src-KF landmarks into dst-KF image; match against
            dst keypoints that carry landmarks.  Returns idx array (K_src,)
            of dst keypoint slots (-1 unmatched)."""
            a_valid = src["lmok"] & src["kpt_valid"]
            if len(taken_src):
                a_valid = a_valid.copy()
                a_valid[list(taken_src)] = False
            T_src = src["pose"]
            p_src = (T_src[:3, :3] @ src["X"].T).T + T_src[:3, 3]
            p_dst = sg * (Rg @ p_src.T).T + tg
            uv, z, _ = self.cam.project(jnp.asarray(p_dst, jnp.float32))
            vis = jnp.asarray(a_valid) & (z > 1e-6)
            pred_level = src["level"]
            radius = radius_base * (sf ** pred_level.astype(np.float32))
            b_valid = dst["lmok"] & dst["kpt_valid"]
            idx, _ = M.projection_scale_match(
                jnp.asarray(src["desc"]), jnp.asarray(dst["desc"]),
                uv, vis, jnp.asarray(radius), jnp.asarray(pred_level),
                jnp.asarray(dst["und"]),
                jnp.asarray(dst["level"]),
                jnp.asarray(b_valid),
                # the reference's Sim3 search runs at the HIGH threshold
                # (drifted descriptors): precision comes from the mutual
                # agreement below + the transform optimizer's chi2 gate
                max_dist=M.HAMMING_DIST_THR_HIGH, cross_check=True,
            )
            return np.asarray(idx)

        # direction 1: cand landmarks -> kf image  (match1[jc] = ik)
        m1 = project_dir(snap["c"], snap["k"], R, t, s, taken_c)
        # direction 2: kf landmarks -> cand image  (match2[ik] = jc)
        Ri = R.T
        si = 1.0 / max(s, 1e-12)
        ti = -si * (Ri @ t)
        m2 = project_dir(snap["k"], snap["c"], Ri, ti, si, taken_k)
        new_k, new_c = [], []
        for jc in np.where(m1 >= 0)[0]:
            ik = int(m1[jc])
            if ik in taken_k or int(jc) in taken_c:
                continue
            if int(m2[ik]) == int(jc):      # mutual agreement
                new_k.append(ik)
                new_c.append(int(jc))
                taken_k.add(ik)
                taken_c.add(int(jc))
        return (np.asarray(new_k, np.int64), np.asarray(new_c, np.int64))
