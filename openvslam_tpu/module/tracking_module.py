"""Tracking module (ref ``tracking_module.*``): per-frame pose tracking state
machine NotInitialized -> Tracking <-> Lost.

Host-side control flow; all numeric work happens in a few jitted calls per
frame (extraction is upstream in models.frontend; here: projection matching +
pose-only LM).  Follows the reference's strategy order: motion-model match ->
(fallback) descriptor match vs last keyframe -> local-map tracking ->
keyframe-insertion decision (SURVEY.md §3.2).
"""
from __future__ import annotations

import collections
import enum
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data import Frame
from ..initialize.two_view import initialize_two_view
from ..models import tracking_ops as TO
from ..ops import match as M
from ..optimize.pose_optimizer import make_pose_optimizer
from ..camera.base import SetupType
from ..utils.log import get_logger

_log = get_logger("tracking")


def _se3_log(T: np.ndarray) -> np.ndarray:
    """4x4 rigid transform -> twist (w[3], v[3]) — host-side numpy twin of
    ops/se3.log_se3 for the per-frame motion model (a jitted call per frame
    would cost more than the whole prediction)."""
    R = T[:3, :3].astype(np.float64)
    t = T[:3, 3].astype(np.float64)
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(cos)
    if th < 1e-8:
        w = 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                            R[1, 0] - R[0, 1]])
        return np.concatenate([w, t])
    w = th / (2.0 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]) / th
    # V^-1 = I - K*th/2 + (1 - th/(2 tan(th/2))) K^2
    Vinv = (np.eye(3) - 0.5 * th * K
            + (1.0 - th / (2.0 * np.tan(th / 2.0))) * (K @ K))
    return np.concatenate([w, Vinv @ t])


def _se3_exp(xi: np.ndarray) -> np.ndarray:
    """twist (w[3], v[3]) -> 4x4 rigid transform (numpy; see _se3_log)."""
    w, v = xi[:3], xi[3:]
    th = np.linalg.norm(w)
    T = np.eye(4)
    if th < 1e-8:
        T[:3, 3] = v
        T[:3, :3] += np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                               [-w[1], w[0], 0]])
        return T
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    s, c = np.sin(th), np.cos(th)
    T[:3, :3] = np.eye(3) + s * K + (1 - c) * (K @ K)
    V = np.eye(3) + (1 - c) / th * K + (th - s) / th * (K @ K)
    T[:3, 3] = V @ v
    return T


class TrackerState(enum.Enum):
    NOT_INITIALIZED = 0
    TRACKING = 1
    LOST = 2


class TrackingModule:
    LOCAL_LM_CAP = 4096          # padded local-map landmark capacity
    # keyframe decay rule (cond_d): insert when the tracked count falls
    # below this fraction of its post-KF peak.  Class attribute so the
    # sensitivity tests (tests/test_heuristic_sensitivity.py) sweep it —
    # the rule must degrade gracefully, not cliff, across +-50%
    KF_PEAK_DECAY = 0.5
    # damped lead-N prediction window W = PRED_WINDOW_MULT * lead (see
    # _predict_pose); swept by the sensitivity tests
    PRED_WINDOW_MULT = 2

    def __init__(self, cfg, cam, map_db, mapper=None, relocalizer=None):
        self.cfg = cfg
        self.cam = cam
        self.map_db = map_db
        self.mapper = mapper
        self.relocalizer = relocalizer
        self.state = TrackerState.NOT_INITIALIZED
        self.init_frame: Optional[Frame] = None
        self.last_frame: Optional[Frame] = None
        self.velocity = np.eye(4, dtype=np.float32)   # T_cur @ inv(T_last)
        self.ref_kf = -1
        self.last_kf_frame_id = -1
        self.num_tracked = 0
        self.key = jax.random.PRNGKey(42)
        nl = cfg.feature.num_levels
        sf = cfg.feature.scale_factor
        self.scale_factors = np.array([sf**l for l in range(nl)], np.float32)
        self.sigma2 = self.scale_factors**2
        self.stereo = cam.setup != SetupType.MONOCULAR
        self.pose_opt = make_pose_optimizer(cam, stereo=self.stereo)
        self.log_scale = float(np.log(sf))
        self.num_levels = nl
        self.frames_since_reloc = 1 << 30
        self._lm_cache = None      # device-resident local-map mirror
        self._peak_tracked = 0     # max inliers since the last keyframe
        self._fetch_pool = None    # lazy result-fetch worker (fused path)
        # recent accepted (frame_id, pose_cw) pairs for multi-step motion
        # prediction in the pipelined feed (see track_fused_dispatch).
        # Dispatch of frame F at pipeline depth d looks up
        # pose(F - 2(d+1)), so the history must hold >= 2d+2 entries —
        # maxlen 64 covers depth 31 at negligible cost (System.feed_sequence
        # clamps depth accordingly)
        self._pose_hist: collections.deque = collections.deque(maxlen=64)
        # pipelined-prediction diagnostics: times the lead-N displacement
        # lookup missed its history entry and fell back to repeated
        # one-frame velocity (the noise-amplifying path — see _predict_pose)
        self.pred_hist_misses = 0
        # capacity-overflow accounting (SURVEY §7 hard part 1)
        self.overflow: dict = {}
        # cumulative seconds the tracking thread spent BLOCKED on fused-step
        # result fetches (device compute + link RTT residual) — the
        # link-wait component of wall time, reported by bench.py so
        # "the wall rate is the tunnel, not the system" is a measured claim
        self.fetch_wait_s = 0.0
        # post-loss grace relocalization (r4: a leading-edge loss used to
        # stay Lost until map RE-ENTRY — ~1000 untracked frames on the city
        # circuit — although the first frames after the loss still overlap
        # the just-built map heavily; only the ~40-inlier gate blocked them)
        self._lost_at: Optional[int] = None
        self._lost_center: Optional[np.ndarray] = None
        self._lost_speed = 0.0

    def _count_overflow(self, what: str, n: int):
        if what not in self.overflow:
            _log.warning(
                "capacity overflow: %s dropped %d entries (first hit; "
                "counted in System.stats()['overflow'])", what, n)
        self.overflow[what] = self.overflow.get(what, 0) + int(n)

    # ------------------------------------------------------------------
    def track(self, frame: Frame) -> Optional[np.ndarray]:
        """Main entry: returns pose_cw (4,4) or None if not tracked."""
        if self.state == TrackerState.NOT_INITIALIZED:
            pose = self._try_initialize(frame)
        elif self.state == TrackerState.TRACKING:
            pose = self._track_frame(frame)
        else:
            pose = self._relocalize(frame)
        self.last_frame = frame
        return pose

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def _try_initialize(self, frame: Frame):
        if self.stereo:
            return self._initialize_with_depth(frame)
        if self.init_frame is None or self.init_frame.num_valid < 100:
            self.init_frame = frame
            return None
        self.key, k = jax.random.split(self.key)
        res = initialize_two_view(k, self.init_frame, frame, self.cam)
        if not res.success:
            # Keep the reference frame while the views still overlap so the
            # baseline ACCUMULATES across attempts (ref mono initializer:
            # the reference is reset only when matches drop below 100 —
            # resetting on every geometric failure pins the pair to
            # consecutive frames and the parallax gate never passes on
            # slow sequences).
            if res.num_matches < 100 and frame.num_valid >= 100:
                self.init_frame = frame
            return None
        # normalize scale: median depth of inliers -> 1 (mono convention)
        good = res.is_inlier
        z = res.points[good][:, 2]
        scale = 1.0 / max(np.median(z), 1e-6)
        T21 = res.T_21.copy()
        T21[:3, 3] *= scale
        pts = res.points * scale

        f1, f2 = self.init_frame, frame
        f1.pose_cw = np.eye(4, dtype=np.float32)
        f2.pose_cw = T21.astype(np.float32)
        db = self.map_db
        kf1 = db.add_keyframe(f1)
        kf2 = db.add_keyframe(f2)
        born = []
        for i in np.where(good)[0]:
            i1, i2 = int(res.idx1[i]), int(res.idx2[i])
            lm = db.add_landmark(
                pts[i].astype(np.float32), f2.desc_u32[i2], f2.desc_i8[i2], kf2
            )
            db.add_observation(lm, kf1, i1)
            db.add_observation(lm, kf2, i2)
            db.update_landmark_descriptor(lm)
            born.append(lm)
            f2.lm_idx[i2] = lm
            f1.lm_idx[i1] = lm
        db.update_landmark_geometry_batch(
            born, self.cfg.feature.scale_factor, self.num_levels)
        db.update_connections(kf1)
        db.update_connections(kf2)
        self.ref_kf = kf2
        self.last_kf_frame_id = f2.frame_id
        self.state = TrackerState.TRACKING
        _log.info("initialized map: two-view bootstrap frames %d/%d, "
                  "%d landmarks", f1.frame_id, f2.frame_id, int(good.sum()))
        self.velocity = np.eye(4, dtype=np.float32)
        self._pose_hist.clear()
        self._record_pose(f2)
        self.num_tracked = int(good.sum())
        # seed the decay rule's peak: without it the first keyframe after
        # init waits for cond_a (a full fps interval), which on fast forward
        # motion is long enough for the bootstrap landmarks to leave the FOV
        self._peak_tracked = self.num_tracked
        if self.mapper is not None:
            self.mapper.after_initialization(kf1, kf2)
        return f2.pose_cw

    def _initialize_with_depth(self, frame: Frame):
        """Stereo/RGBD: bootstrap from a single frame's depths (ref
        tracking_module initialization for non-mono setups)."""
        has_depth = frame.valid & (frame.depth > 0)
        if has_depth.sum() < 50:
            return None
        frame.pose_cw = np.eye(4, dtype=np.float32)
        db = self.map_db
        kf = db.add_keyframe(frame)
        bz = frame.bearing[:, 2]
        born = []
        for i in np.where(has_depth)[0]:
            if bz[i] <= 1e-6:
                continue
            X = frame.bearing[i] * (frame.depth[i] / bz[i])
            lm = db.add_landmark(
                X.astype(np.float32), frame.desc_u32[i], frame.desc_i8[i], kf
            )
            db.add_observation(lm, kf, int(i))
            born.append(lm)
            frame.lm_idx[i] = lm
        db.update_landmark_geometry_batch(
            born, self.cfg.feature.scale_factor, self.num_levels)
        db.update_connections(kf)
        self.ref_kf = kf
        self.last_kf_frame_id = frame.frame_id
        self.state = TrackerState.TRACKING
        _log.info("initialized map: depth bootstrap frame %d, %d landmarks",
                  frame.frame_id, int(has_depth.sum()))
        self.velocity = np.eye(4, dtype=np.float32)
        self._pose_hist.clear()
        self._record_pose(frame)
        self.num_tracked = int(has_depth.sum())
        self._peak_tracked = self.num_tracked   # see mono init note
        if self.mapper is not None:
            self.mapper.after_stereo_initialization(kf)
        return frame.pose_cw

    # ------------------------------------------------------------------
    # frame-to-frame tracking
    # ------------------------------------------------------------------
    def _update_last_frame_landmarks(self):
        lf = self.last_frame
        db = self.map_db
        ids = np.where(lf.lm_idx >= 0)[0]
        if not len(ids):
            return
        lm = lf.lm_idx[ids]
        # fast path: resolve_replaced is the identity for live landmarks, so
        # only walk replacement chains for the (rare) invalidated entries
        for j in np.where(~db.lm_valid[lm])[0]:
            lf.lm_idx[ids[j]] = db.resolve_replaced(int(lm[j]))

    def _pose_optimize(self, frame: Frame, T_init: np.ndarray):
        obs_mask = (frame.lm_idx >= 0) & frame.valid
        lm = np.clip(frame.lm_idx, 0, None)
        X = self.map_db.lm_pos[lm]
        sigma2 = self.sigma2[np.clip(frame.level, 0, self.num_levels - 1)]
        if self.stereo:
            obs = np.concatenate(
                [frame.xy_undist, frame.x_right[:, None]], -1
            ).astype(np.float32)
        else:
            obs = frame.xy_undist
        res = self.pose_opt(
            jnp.asarray(T_init, jnp.float32), jnp.asarray(X),
            jnp.asarray(obs), jnp.asarray(sigma2),
            jnp.asarray(obs_mask),
        )
        inl = np.asarray(res.inliers)
        frame.outlier = obs_mask & ~inl
        return np.asarray(res.T_cw), int(res.num_inliers)

    def _motion_match(self, frame: Frame, T_pred, radius):
        """Match last frame's landmarks into current frame by projection."""
        lf = self.last_frame
        has_lm = (lf.lm_idx >= 0) & lf.valid & ~lf.outlier
        ids = np.where(has_lm)[0]
        if len(ids) == 0:
            return 0
        lm_ids = lf.lm_idx[ids]
        L = self.LOCAL_LM_CAP
        n = min(len(lm_ids), L)
        lm_ids = lm_ids[:n]
        pos = np.zeros((L, 3), np.float32)
        desc = np.zeros((L, 256), np.int8)
        valid = np.zeros(L, bool)
        pos[:n] = self.map_db.lm_pos[lm_ids]
        desc[:n] = self.map_db.lm_desc_i8[lm_ids]
        valid[:n] = True
        pred_lvl = np.full(L, -1, np.int32)
        pred_lvl[:n] = lf.level[ids[:n]]
        idx, dist, vis = TO.match_landmarks_by_projection(
            self.cam, jnp.asarray(T_pred, jnp.float32), jnp.asarray(pos),
            jnp.asarray(desc), jnp.asarray(valid),
            jnp.asarray(frame.desc_i8), jnp.asarray(frame.xy_undist),
            jnp.asarray(frame.valid), jnp.asarray(frame.level),
            jnp.float32(radius), jnp.asarray(self.scale_factors),
            jnp.asarray(pred_lvl),
        )
        idx = np.asarray(idx)
        nmatch = 0
        for j in np.where(idx >= 0)[0]:
            kpt = int(idx[j])
            if frame.lm_idx[kpt] < 0:
                frame.lm_idx[kpt] = lm_ids[j]
                nmatch += 1
        return nmatch

    def _refresh_local_map_cache(self, seed_lms: np.ndarray):
        """Device-resident local-map mirror, rebuilt only when the map
        changed (db.version) or the reference KF moved — between keyframes
        the same arrays are reused, so per-frame host->device traffic is
        just the image and the pose (SURVEY.md §7 hard part 3)."""
        db = self.map_db
        key = (db.version, self.ref_kf)
        if self._lm_cache is not None and self._lm_cache["key"] == key:
            return self._lm_cache
        local_kfs, local_lms = db.acquire_local_map(seed_lms, max_kfs=60)
        L = self.LOCAL_LM_CAP
        if len(local_lms) > L:
            self._count_overflow("local_map_lms", len(local_lms) - L)
            # keep the most-established landmarks: an arbitrary prefix cut
            # drops whatever acquire_local_map happened to order last —
            # under async mapping lag that was the confirmed map, leaving
            # the matcher a wall of 1-observation stereo seeds (frame-58
            # collapse).  Observation count is the quality signal the cull
            # stage itself uses.
            local_lms = np.asarray(local_lms, np.int64)
            obs = db.lm_num_obs[local_lms]
            keep = np.argpartition(-obs, L - 1)[:L]
            local_lms = local_lms[np.sort(keep)]
        n = min(len(local_lms), L)
        cand = np.asarray(local_lms[:n], np.int64)
        pos = np.zeros((L, 3), np.float32)
        desc = np.zeros((L, 256), np.int8)
        valid = np.zeros(L, bool)
        maxd = np.zeros(L, np.float32)
        if n:
            pos[:n] = db.lm_pos[cand]
            desc[:n] = db.lm_desc_i8[cand]
            valid[:n] = True
            maxd[:n] = db.lm_max_dist[cand]
        self._lm_cache = {
            "key": key, "cand": cand, "n": n,
            "pos": jnp.asarray(pos), "desc": jnp.asarray(desc),
            "valid": jnp.asarray(valid), "maxd": jnp.asarray(maxd),
        }
        return self._lm_cache

    def _track_local_map(self, frame: Frame, T_cur, radius=None):
        db = self.map_db
        cache = self._refresh_local_map_cache(frame.lm_idx[frame.lm_idx >= 0])
        n = cache["n"]
        if n == 0:
            return T_cur, self.num_tracked
        pred = TO.predict_scale_levels(
            cache["pos"], jnp.asarray(T_cur, jnp.float32), cache["maxd"],
            jnp.int32(self.num_levels), jnp.float32(self.log_scale),
        )
        # only unmatched keypoints take part (matched lms are post-filtered)
        kpt_free = frame.valid & (frame.lm_idx < 0)
        n_seeds = int((frame.lm_idx >= 0).sum())
        if radius is None:
            radius = 4.0 if n_seeds >= 50 else 9.0
        idx, dist, vis = TO.match_landmarks_by_projection(
            self.cam, jnp.asarray(T_cur, jnp.float32), cache["pos"],
            cache["desc"], cache["valid"],
            jnp.asarray(frame.desc_i8), jnp.asarray(frame.xy_undist),
            jnp.asarray(kpt_free), jnp.asarray(frame.level),
            jnp.float32(radius), jnp.asarray(self.scale_factors),
            pred,
        )
        idx = np.asarray(idx)
        cand = cache["cand"]
        vis_np = np.asarray(vis)[:n]
        db.lm_n_visible[cand[vis_np]] += 1
        already = set(int(x) for x in frame.lm_idx[frame.lm_idx >= 0])
        for j in np.where(idx >= 0)[0]:
            if j >= n:
                continue
            lm = int(cand[j])
            if lm in already or not db.lm_valid[lm]:
                continue
            kpt = int(idx[j])
            if frame.lm_idx[kpt] < 0:
                frame.lm_idx[kpt] = lm
        T_new, num_inl = self._pose_optimize(frame, T_cur)
        # bump found counters for inlier landmarks
        inl_lms = frame.lm_idx[(frame.lm_idx >= 0) & ~frame.outlier]
        db.lm_n_found[inl_lms] += 1
        return T_new, num_inl

    def _rescue_with_local_map(self, frame: Frame, T_pred):
        """Wide-radius local-map association at the predicted pose, then
        pose optimization — recovers frames whose frame-to-frame matching
        broke while the local map is still valid."""
        lf = self.last_frame
        if lf is not None:        # seed the cache from the last good frame
            self._refresh_local_map_cache(lf.lm_idx[lf.lm_idx >= 0])
        frame.lm_idx[:] = -1
        frame.outlier[:] = False
        T_cur, num_inl = self._track_local_map(frame, T_pred, radius=15.0)
        if not (frame.lm_idx >= 0).any():
            return T_pred, 0      # no local map to rescue against
        return T_cur, num_inl

    def _go_lost(self, frame: Frame):
        """Transition to Lost, recording where tracking died (frame id,
        camera center, speed) for the post-loss grace relocalization
        window — see _relocalize."""
        self.state = TrackerState.LOST
        self._lost_at = frame.frame_id
        lp = self.last_frame.pose_cw if self.last_frame is not None else None
        if lp is not None:
            self._lost_center = (-lp[:3, :3].T @ lp[:3, 3]).astype(np.float64)
            self._lost_speed = max(
                float(np.linalg.norm(self.velocity[:3, 3])), 1e-3)
        else:
            self._lost_center = None

    def _rescue_acceptable(self, T_cur, T_pred, num_inl: int) -> bool:
        """Borderline rescue acceptance: a thin (12+) inlier set counts when
        the optimized pose agrees with the constant-velocity prediction —
        the map is sparse at the leading edge, not wrong.  Bounds: the
        translation residual vs prediction stays under max(1.5x the frame
        displacement, 0.5), rotation under ~10 degrees.  Disabled inside the
        30-frame post-relocalization window: thr=50 exists there precisely
        because the reloc anchor may be a false match, and right after reloc
        the constant-velocity prediction is itself seeded from that anchor —
        "agrees with prediction" would keep a wrong-corridor reloc alive on
        12 inliers (mirrors the reference's stricter post-reloc gate)."""
        if num_inl < 12 or self.frames_since_reloc <= 30:
            return False
        d = np.linalg.inv(T_pred) @ T_cur
        dt = float(np.linalg.norm(d[:3, 3]))
        dr = float(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
        v_t = float(np.linalg.norm(self.velocity[:3, 3]))
        return dt < max(1.5 * v_t, 0.5) and dr < np.deg2rad(10.0)

    def _track_frame(self, frame: Frame):
        self._update_last_frame_landmarks()
        T_pred = (self.velocity @ self.last_frame.pose_cw).astype(np.float32)
        nmatch = self._motion_match(frame, T_pred, radius=7.0)
        if nmatch < 20:
            frame.lm_idx[:] = -1
            nmatch = self._motion_match(frame, T_pred, radius=14.0)
        if nmatch < 20:
            # fallback 1 (ref bow_match_based_track): word-gated match against
            # the reference keyframe's landmarks
            nmatch = self._bow_match_ref_kf(frame)
            if nmatch >= 20:
                T_pred = self.last_frame.pose_cw
        if nmatch < 20:
            # fallback 2 (ref robust_match_based_track analog): unconstrained
            # descriptor match against last frame
            n2 = self._fallback_match_last_frame(frame)
            if n2 > nmatch:
                nmatch = n2
                T_pred = self.last_frame.pose_cw
        thr = 20 if self.frames_since_reloc > 30 else 50
        weak_ok = False
        T_mm_pred = (self.velocity @ self.last_frame.pose_cw).astype(
            np.float32)
        if nmatch < 10:
            # frame-to-frame association collapsed while the map may still
            # be fine (fast motion, appearance flicker): one wide local-map
            # search at the predicted pose before declaring Lost — cheaper
            # and far more likely than BoW relocalization mid-sequence
            T_cur, num_inl = self._rescue_with_local_map(frame, T_mm_pred)
            weak_ok = self._rescue_acceptable(T_cur, T_mm_pred, num_inl)
            if num_inl < thr and not weak_ok:
                self._go_lost(frame)
                _log.info("tracking lost at frame %d: %d matches after all "
                          "strategies (+rescue %d inliers)",
                          frame.frame_id, nmatch, num_inl)
                frame.pose_cw = None
                return None
        else:
            T_cur, num_inl = self._pose_optimize(frame, T_pred)
            if num_inl < 10:
                T_cur, num_inl = self._rescue_with_local_map(frame, T_mm_pred)
                weak_ok = self._rescue_acceptable(T_cur, T_mm_pred, num_inl)
                if num_inl < thr and not weak_ok:
                    self._go_lost(frame)
                    _log.info("tracking lost at frame %d: %d inliers after "
                              "pose optimization", frame.frame_id, num_inl)
                    frame.pose_cw = None
                    return None
            else:
                # drop outlier associations before local-map search
                frame.lm_idx[frame.outlier] = -1
                frame.outlier[:] = False
                T_cur, num_inl = self._track_local_map(frame, T_cur)
        if num_inl < thr and not weak_ok:
            # borderline inlier count on the NORMAL path too: accept when
            # the optimized pose agrees with the motion prediction (thin
            # local map mid-corner, not a wrong pose)
            weak_ok = self._rescue_acceptable(T_cur, T_mm_pred, num_inl)
        if num_inl < thr and not weak_ok:
            self._go_lost(frame)
            _log.info("tracking lost at frame %d: %d local-map inliers "
                      "(threshold %d)", frame.frame_id, num_inl, thr)
            frame.pose_cw = None
            return None
        frame.pose_cw = T_cur.astype(np.float32)
        self.num_tracked = num_inl
        self._peak_tracked = max(self._peak_tracked, num_inl)
        self.velocity = (frame.pose_cw @ np.linalg.inv(self.last_frame.pose_cw)).astype(np.float32)
        self._record_pose(frame)
        self.frames_since_reloc += 1
        if self._new_keyframe_needed(frame):
            self._insert_keyframe(frame)
        return frame.pose_cw

    # ------------------------------------------------------------------
    # fused tracking path (models.track_step): one device call per frame
    # ------------------------------------------------------------------
    def track_fused(self, image_u8, frame_id: int, timestamp: float,
                    step, mask=None, aux=None) -> Optional[np.ndarray]:
        """Drive one frame through the fused TrackStep.  Preconditions:
        state == TRACKING with a last frame (the caller falls back to the
        classic path otherwise).  Returns (pose or None, Frame)."""
        return self.track_fused_finish(self.track_fused_dispatch(
            image_u8, frame_id, timestamp, step, mask, aux))

    def close(self):
        """Release the result-fetch worker (System.shutdown calls this)."""
        if self._fetch_pool is not None:
            self._fetch_pool.shutdown(wait=True)
            self._fetch_pool = None

    def _record_pose(self, frame: Frame):
        self._pose_hist.append((frame.frame_id, frame.pose_cw.copy()))

    def _predict_pose(self, lf: Frame, lead: int) -> np.ndarray:
        """Constant-velocity pose prediction ``lead`` frames past ``lf``.
        For lead>=2 (pipelined feed) the one-frame velocity must NOT be
        applied repeatedly: with pose estimates T_i = true_i·exp(d_i) that
        prediction errs by ~3·d_{i-1} - 2·d_{i-2} (worse at higher lead),
        and the closed loop (prediction -> match -> new estimate) amplifies
        estimation noise ~2x every cycle until stage-1 matching collapses
        (measured: the prediction-vs-final rotation error doubled every two
        frames).  Applying the LEAD-frame displacement
        pose(i-1)·pose(i-1-lead)^-1 ONCE errs by ~2·d_{i-1} - d_{i-1-lead}
        — the same noise amplification as the reference's per-frame motion
        model — and that was still too hot on sustained-yaw trajectories
        (r3: depth-3 rotating-lap stereo ATE 0.08 -> 1.67 m).  The damped
        form estimates the average per-frame twist over a WIDER window
        W ≈ 2·lead in SE3 log space and scales it to ``lead``:
            xi = log(pose(i-1)·pose(i-1-W)^-1) / W
            T_pred = exp(lead·xi) · pose(i-1)
        Exact for constant-twist motion (including steady turns), and the
        window noise term shrinks from (d_{i-1}-d_{i-1-lead}) to
        (d_{i-1}-d_{i-1-W})·lead/W — half the amplification at W=2·lead —
        which is what breaks the prediction->match->estimate feedback loop
        under rotation (tools/depth_sweep.py measures this)."""
        if lead >= 2:
            best_fid = None
            # preferred window: W = PRED_WINDOW_MULT·lead (default 2·lead)
            lo = lf.frame_id - self.PRED_WINDOW_MULT * lead
            hi = lf.frame_id - lead          # minimum usable window: W = lead
            for fid, pose in self._pose_hist:
                if lo <= fid <= hi and (best_fid is None or fid < best_fid):
                    best_fid, best_pose = fid, pose
            if best_fid is not None:
                W = lf.frame_id - best_fid
                D = lf.pose_cw @ np.linalg.inv(best_pose)
                if W == lead:
                    return (D @ lf.pose_cw).astype(np.float32)
                xi = _se3_log(D) * (lead / W)
                return (_se3_exp(xi) @ lf.pose_cw).astype(np.float32)
            self.pred_hist_misses += 1
        T_pred = lf.pose_cw
        for _ in range(max(1, lead)):
            T_pred = self.velocity @ T_pred
        return T_pred.astype(np.float32)

    def track_fused_dispatch(self, image_u8, frame_id: int, timestamp: float,
                             step, mask=None, aux=None):
        """Issue the fused device step WITHOUT blocking on its result (JAX
        dispatch is asynchronous).  The motion prediction extrapolates the
        constant-velocity model ``frame_id - last_frame.frame_id`` steps —
        1 unpipelined, depth+1 in the pipelined System feed, which
        dispatches frames before earlier ones' bookkeeping has run.
        Returns an opaque in-flight handle for ``track_fused_finish``."""
        import jax.numpy as jnp
        db = self.map_db
        self._update_last_frame_landmarks()
        lf = self.last_frame
        has = (lf.lm_idx >= 0) & lf.valid & ~lf.outlier
        ids = np.where(has)[0]
        lm_ids = lf.lm_idx[ids]
        keep = db.lm_valid[lm_ids]
        ids, lm_ids = ids[keep], lm_ids[keep]
        P = step.prev_capacity
        if len(lm_ids) > P:
            self._count_overflow("prev_frame_lms", len(lm_ids) - P)
        n = min(len(lm_ids), P)
        ids, lm_ids = ids[:n], lm_ids[:n]
        prev_pos = np.zeros((P, 3), np.float32)
        prev_desc = np.zeros((P, 8), np.uint32)
        prev_valid = np.zeros(P, bool)
        prev_level = np.full(P, -1, np.int32)
        prev_pos[:n] = db.lm_pos[lm_ids]
        prev_desc[:n] = db.lm_desc_u32[lm_ids]
        prev_valid[:n] = True
        prev_level[:n] = lf.level[ids]

        cache = self._refresh_local_map_cache(lm_ids)
        cand = cache["cand"]
        # map local slots to last-frame slots for exact stage-2 dedup
        loc_prev_slot = np.full(step.lm_capacity, -1, np.int32)
        if n and len(cand):
            order = np.argsort(lm_ids, kind="stable")
            sorted_ids = lm_ids[order]
            pos = np.searchsorted(sorted_ids, cand)
            posc = np.clip(pos, 0, len(sorted_ids) - 1)
            hit = sorted_ids[posc] == cand
            loc_prev_slot[:len(cand)] = np.where(hit, order[posc], -1)

        T_pred = self._predict_pose(lf, max(1, frame_id - lf.frame_id))
        res = step.step(
            jnp.asarray(image_u8), mask, jnp.asarray(T_pred),
            jnp.asarray(prev_pos), jnp.asarray(prev_desc),
            jnp.asarray(prev_valid), jnp.asarray(prev_level),
            cache["pos"], cache["desc"], cache["valid"], cache["maxd"],
            jnp.asarray(loc_prev_slot), aux,
        )
        # Result readback, tuned for remote-TPU tunnels (harmless locally):
        # 1. copy_to_host_async on every output at dispatch — the copies
        #    stream back ~one link round trip after the step completes, and
        #    later np.asarray calls hit that host-side cache (~0.2 ms)
        #    instead of doing a cold ~30 ms fetch EACH;
        # 2. the blocking np.asarray pass runs on a background worker, so
        #    the residual wait (compute + RTT after dispatch) never occupies
        #    the tracking thread — it overlaps pipelined frames and other
        #    sessions' work.
        try:
            for x in res:
                x.copy_to_host_async()
        except (AttributeError, TypeError):
            pass
        if self._fetch_pool is None:
            import concurrent.futures
            self._fetch_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="track-fetch")
        fetch = self._fetch_pool.submit(
            lambda: type(res)(*[np.asarray(x) for x in res]))
        return {
            "fetch": fetch,
            "frame_id": frame_id, "timestamp": timestamp,
            "lm_ids": lm_ids, "n": n, "cand": cand, "n_loc": cache["n"],
            "P": P, "L": step.lm_capacity,
        }

    def track_fused_finish(self, handle) -> Optional[np.ndarray]:
        """Block on an in-flight fused step and run the host bookkeeping
        (association, counters, velocity, keyframe decision).  Between a
        pipelined dispatch and this finish the async mapper may have culled
        or fused landmarks, so every stale landmark id is re-validated
        against the live map before use (one-frame-stale-map semantics —
        the same contract the reference's async mapping already grants)."""
        import jax.numpy as jnp
        db = self.map_db
        lf = self.last_frame
        frame_id = handle["frame_id"]
        timestamp = handle["timestamp"]
        lm_ids, n = handle["lm_ids"], handle["n"]
        cand, n_loc = handle["cand"], handle["n_loc"]
        P, L = handle["P"], handle["L"]
        import time as _time
        _tf = _time.perf_counter()
        res = handle["fetch"].result()   # np arrays, fetched by the worker
        self.fetch_wait_s += _time.perf_counter() - _tf
        from ..models.track_step import unpack_bits_host
        frame = Frame(
            frame_id=frame_id, timestamp=timestamp,
            xy=res.kp_xy, xy_undist=res.kp_und, bearing=res.kp_bearing,
            level=res.kp_level, angle=res.kp_angle, response=res.kp_response,
            desc_u32=res.kp_desc_u32,
            desc_i8=unpack_bits_host(res.kp_desc_u32, res.kp_valid),
            valid=res.kp_valid,
            x_right=res.kp_x_right.astype(np.float32),
            depth=res.kp_depth.astype(np.float32),
            lm_idx=np.full(res.kp_xy.shape[0], -1, np.int32),
            outlier=np.zeros(res.kp_xy.shape[0], bool),
        )
        n1 = int(res.n_stage1)
        n2 = int(res.num_inliers)
        thr = 20 if self.frames_since_reloc > 30 else 50
        if n1 < 10 or n2 < thr:
            # rare path: replay the classic ladder on the extracted frame
            pose = self._track_frame(frame)
            self.last_frame = frame
            return pose, frame

        # landmark bookkeeping (host, vectorized): slots -> real landmark ids
        src = res.kp_src.astype(np.int64)
        prev_tab = np.full(P, -1, np.int64)
        prev_tab[:n] = lm_ids
        loc_tab = np.full(L, -1, np.int64)
        loc_tab[:n_loc] = cand[:n_loc]
        comb = np.concatenate([prev_tab, loc_tab])
        lm_of_kpt = np.where(src >= 0, comb[np.clip(src, 0, len(comb) - 1)], -1)
        # landmarks fused away between dispatch and finish (pipelined feed:
        # keyframe insertion ran while this frame was in flight) are
        # forwarded to their replacement, not dropped
        stale = (lm_of_kpt >= 0) & ~db.lm_valid[np.clip(lm_of_kpt, 0, None)]
        for j in np.where(stale)[0]:
            r = db.resolve_replaced(int(lm_of_kpt[j]))
            if r >= 0 and (lm_of_kpt == r).any():
                r = -1      # replacement already observed in this frame
            lm_of_kpt[j] = r
        lm_of_kpt = np.where(
            (lm_of_kpt >= 0) & db.lm_valid[np.clip(lm_of_kpt, 0, None)],
            lm_of_kpt, -1)
        frame.lm_idx = lm_of_kpt.astype(np.int32)
        frame.outlier = (frame.lm_idx >= 0) & ~res.kp_inlier
        vis_np = res.loc_visible[:n_loc]
        vis_ids = cand[:n_loc][vis_np]
        vis_ids = vis_ids[db.lm_valid[vis_ids]]   # culled since dispatch
        db.lm_n_visible[vis_ids] += 1
        inl_lms = frame.lm_idx[(frame.lm_idx >= 0) & ~frame.outlier]
        db.lm_n_found[inl_lms] += 1

        frame.pose_cw = res.T_cw.astype(np.float32)
        self.num_tracked = n2
        self._peak_tracked = max(self._peak_tracked, n2)
        self.velocity = (
            frame.pose_cw @ np.linalg.inv(lf.pose_cw)).astype(np.float32)
        self._record_pose(frame)
        self.frames_since_reloc += 1
        if self._new_keyframe_needed(frame):
            self._insert_keyframe(frame)
        self.last_frame = frame
        return frame.pose_cw, frame

    def _bow_match_ref_kf(self, frame: Frame):
        """Word-gated descriptor match vs the reference keyframe's landmarks
        (ref frame_tracker::bow_match_based_track).  Needs a BoW database."""
        if self.relocalizer is None or self.ref_kf < 0:
            return 0
        bow_db = self.relocalizer.bow_db
        db = self.map_db
        if self.ref_kf not in bow_db.kf_words:
            return 0
        from ..ops import bow as bow_ops
        words = bow_db.compute_words(frame.desc_i8, frame.valid)
        gate = bow_ops.word_gate(
            jnp.asarray(bow_db.gate_words(words)),
            jnp.asarray(bow_db.gate_words(bow_db.kf_words[self.ref_kf]))
        )
        has_lm = (db.kf_lm_idx[self.ref_kf] >= 0) & db.kf_kpt_valid[self.ref_kf]
        idx, dist = M.match_descriptors(
            jnp.asarray(frame.desc_i8), jnp.asarray(db.kf_desc_i8[self.ref_kf]),
            jnp.asarray(frame.valid), jnp.asarray(has_lm),
            gate=gate, max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9,
            cross_check=True,
        )
        idx = np.asarray(idx)
        n = 0
        for i in np.where(idx >= 0)[0]:
            lm = int(db.kf_lm_idx[self.ref_kf][idx[i]])
            if lm >= 0 and db.lm_valid[lm] and frame.lm_idx[i] < 0:
                frame.lm_idx[i] = lm
                n += 1
        return n

    def _fallback_match_last_frame(self, frame: Frame):
        lf = self.last_frame
        has_lm = (lf.lm_idx >= 0) & lf.valid
        idx, dist = M.match_descriptors(
            jnp.asarray(lf.desc_i8), jnp.asarray(frame.desc_i8),
            jnp.asarray(has_lm), jnp.asarray(frame.valid),
            max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9, cross_check=True,
        )
        idx = np.asarray(idx)
        n = 0
        for i in np.where(idx >= 0)[0]:
            kpt = int(idx[i])
            if frame.lm_idx[kpt] < 0:
                frame.lm_idx[kpt] = lf.lm_idx[i]
                n += 1
        return n

    # ------------------------------------------------------------------
    # keyframe insertion (ref module/keyframe_inserter)
    # ------------------------------------------------------------------
    def _new_keyframe_needed(self, frame: Frame) -> bool:
        if self.mapper is None:
            return False
        if (self.ref_kf < 0 or self.ref_kf >= len(self.map_db.kf_valid)
                or not self.map_db.kf_valid[self.ref_kf]):
            # no live reference keyframe (resumed session, or it was
            # culled): insert one as soon as tracking is reliable
            return self.num_tracked > 15
        # reliable landmarks in reference KF (>=3 observers after 2+ KFs)
        min_obs = 3 if self.map_db.n_kfs > 2 else 2
        ref_arr = self.map_db.kf_lm_idx[self.ref_kf]
        ref_lms = ref_arr[ref_arr >= 0]
        n_reliable = int(
            (self.map_db.lm_num_obs[ref_lms] >= min_obs).sum()
        ) if len(ref_lms) else 0
        frames_since = frame.frame_id - self.last_kf_frame_id
        max_frames = int(self.cam.fps)
        cond_a = frames_since >= max_frames
        cond_c = self.num_tracked < n_reliable * 0.9
        # decay rule (beyond the reference): under sustained panning the
        # tracked count bursts after each KF then decays as landmarks exit
        # the forward FOV edge; waiting for cond_c leaves the count hovering
        # just above the lost threshold.  Insert when the count halves from
        # its post-KF peak so triangulation refills the leading edge early.
        cond_d = (frames_since >= 1
                  and self.num_tracked < self.KF_PEAK_DECAY
                  * self._peak_tracked)
        enough = self.num_tracked > 15
        # ref keyframe_inserter parity ([U:module/keyframe_inserter]): the
        # mapping queue gates insertion.  With async mapping saturated
        # (>=2 queued KFs) every extra keyframe seeds hundreds of stereo
        # depth landmarks whose culling lags several KFs behind, ballooning
        # the local map past its device capacity and crowding the
        # established landmarks out of the matcher (observed: async city
        # run lost at frame 58 with 8.4k live lms vs sync's 2k).  Hold new
        # KFs under saturation unless the tracked count is decaying toward
        # the lost threshold.
        if getattr(self.mapper, "backlog", 0) >= 2:
            return enough and self.num_tracked < 60
        return enough and (cond_a or cond_c or cond_d)

    def _insert_keyframe(self, frame: Frame):
        # NOTE: no blocking here — this runs with the map lock held, and
        # waiting for the mapper while holding the lock starves the very
        # queue being waited on.  Backpressure lives in System._pace_mapper
        # (feed path, before the lock).
        kf = self.mapper.insert_keyframe(frame)
        _log.debug("keyframe %d inserted at frame %d (%d tracked)",
                   kf, frame.frame_id, self.num_tracked)
        self.ref_kf = kf
        self.last_kf_frame_id = frame.frame_id
        self._peak_tracked = 0

    # ------------------------------------------------------------------
    GRACE_FRAMES = 90        # post-loss window with the relaxed reloc gate
    GRACE_GATE = 25          # inlier gate inside the window (normal: 40)

    def _relocalize(self, frame: Frame):
        if self.relocalizer is None:
            return None
        # Post-loss grace: for GRACE_FRAMES after a loss the camera is still
        # near the just-built map (leading-edge losses leave nothing AHEAD to
        # relocalize against later — r3/r4 city runs stayed Lost for ~1000
        # frames until map re-entry).  A relaxed gate alone would resurrect
        # the perceptual-aliasing false relocs fd6071a fixed, so a relaxed
        # accept must ALSO land within the distance the camera can have
        # travelled since the loss (metric maps; mono maps carry the same
        # check in map units via the last velocity).
        d_lost = (frame.frame_id - self._lost_at
                  if self._lost_at is not None else None)
        grace = (d_lost is not None and d_lost <= self.GRACE_FRAMES
                 and self._lost_center is not None)
        T = self.relocalizer.relocalize(
            frame, min_inliers=self.GRACE_GATE if grace else None)
        if T is None:
            return None
        gate = 40
        if grace:
            c = -T[:3, :3].T.astype(np.float64) @ T[:3, 3]
            bound = max(3.0 * self._lost_speed,
                        1.5 * self._lost_speed * (d_lost + 10))
            if float(np.linalg.norm(c - self._lost_center)) <= bound:
                gate = self.GRACE_GATE
            # outside the bound: fall through with the full gate — a far
            # match can still be a legitimate re-entry relocalization
        frame.pose_cw = T.astype(np.float32)
        T_cur, num_inl = self._track_local_map(frame, frame.pose_cw)
        if num_inl < gate:
            # the reference accepts relocalization only at ~50 inliers:
            # under perceptual aliasing (repeated street texture) a ~30
            # inlier "success" is routinely a FALSE match that would anchor
            # the tracker to the wrong corridor
            frame.pose_cw = None
            return None
        frame.pose_cw = T_cur.astype(np.float32)
        self.state = TrackerState.TRACKING
        _log.info("relocalized at frame %d (%d local-map inliers%s)",
                  frame.frame_id, num_inl,
                  ", grace" if gate == self.GRACE_GATE else "")
        self.velocity = np.eye(4, dtype=np.float32)
        self._pose_hist.clear()
        self._record_pose(frame)
        # re-anchor on the keyframe the relocalizer matched (a resumed or
        # long-lost session has no valid reference keyframe otherwise)
        reloc_kf = getattr(self.relocalizer, "last_reloc_kf", -1)
        if reloc_kf >= 0:
            self.ref_kf = reloc_kf
            self.last_kf_frame_id = frame.frame_id
        self.num_tracked = num_inl
        # A spatially-verified grace reloc skips the 30-frame distrust
        # window (thr=50, no weak acceptance): the proximity bound is the
        # evidence the window exists to gather, and the thin-margin regime
        # that caused the loss would re-lose instantly under thr=50.
        self.frames_since_reloc = 31 if gate == self.GRACE_GATE else 0
        self._lost_at = None
        self._lost_center = None
        return frame.pose_cw
