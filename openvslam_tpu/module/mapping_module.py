"""Mapping module (ref ``mapping_module.*``): keyframe insertion pipeline —
store KF, cull fresh landmarks, triangulate new landmarks with covisible
keyframes, fuse duplicates, local BA, cull redundant keyframes
(SURVEY.md §3.3).

Synchronous host orchestration (the async/thread contract of the reference is
provided one level up by the System's executor); numeric work is jitted:
epipolar-gated matching, checked triangulation, dense-Schur local BA.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..utils.log import get_logger

_log = get_logger("mapping")

from ..models import tracking_ops as TO
from ..optimize.ba import BAProblem, shared_local_ba


class MappingModule:
    def __init__(self, cfg, cam, map_db,
                 ba_cams: int = 24, ba_lms: int = 4096, ba_obs: int = 16384,
                 global_optimizer=None):
        from ..camera.base import SetupType
        self.cfg = cfg
        self.cam = cam
        self.stereo = cam.setup != SetupType.MONOCULAR
        self.db = map_db
        self.global_optimizer = global_optimizer
        nl = cfg.feature.num_levels
        sf = cfg.feature.scale_factor
        self.scale_factors = np.array([sf**l for l in range(nl)], np.float32)
        self.sigma2 = self.scale_factors**2
        self.num_levels = nl
        self.C, self.L, self.O = ba_cams, ba_lms, ba_obs
        # solver iteration schedule (ref local_bundle_adjuster: LM 5 iters,
        # outlier removal, 10 more); kept as attributes so the
        # ba_iters_per_s stat tracks the configured schedule
        self.ba_first_iters, self.ba_second_iters = 5, 10
        self.local_ba = shared_local_ba(
            cam, stereo=self.stereo, first_iters=self.ba_first_iters,
            second_iters=self.ba_second_iters)
        self._local_ba_multicam = None    # built lazily (merged-session maps)
        self.recent_lms: List[Tuple[int, int]] = []   # (lm, born_kf)
        self.num_covis_for_triangulation = 10
        self.abort_ba = False
        # capacity-overflow accounting (SURVEY §7 hard part 1): every silent
        # truncation is counted and WARN-logged on first occurrence
        self.overflow: dict = {}
        # observability counters (SURVEY §5.5: BA iterations/s)
        self.ba_runs = 0
        self.ba_iters_total = 0
        self.ba_wall_s = 0.0
        self.lms_culled = 0
        self.kfs_culled = 0
        # churn attribution (r5): creation source + cull reason
        self.lms_created_seed = 0
        self.lms_created_tri = 0
        self.seeds_skipped = 0          # coverage-gated seeds not created
        self.culled_ratio = 0           # found/visible ratio cull
        self.culled_obs = 0             # num_obs <= 2 at age 2 cull
        # unlocked-stage results discarded because a whole-map geometry
        # rewrite landed while the device call was in flight
        self.stale_discards = 0
        self.lms_created = 0
        # per-phase wall-clock accumulators for the KF-insertion pipeline
        self.phase_s: dict = {}
        self._dev_kf: dict = {}    # kf -> device-resident keypoint columns
        # optional map lock for the async pipeline: held around db reads and
        # write-backs but RELEASED during the jitted BA solve (the solve works
        # on padded copies) — the reference's mutex discipline, same contract
        self.map_lock = None

    def _phase(self, name: str, t0: float) -> float:
        import time as _time
        now = _time.perf_counter()
        self.phase_s[name] = self.phase_s.get(name, 0.0) + (now - t0)
        return now

    def _lock(self):
        import contextlib
        return (self.map_lock if self.map_lock is not None
                else contextlib.nullcontext())

    # ------------------------------------------------------------------
    # device-resident per-keyframe operands.  Keypoint columns (descriptors,
    # bearings, undistorted coords, angles, per-level sigma2) are immutable
    # once a keyframe is stored, but triangulation + fusion re-uploaded ~10
    # neighbors' worth (1-4 MB) through the device link on EVERY keyframe
    # insertion — measured 200+ ms/KF each on the tunnel.  Upload once at
    # store time, reuse forever; poses stay host-side (BA moves them).
    # ------------------------------------------------------------------
    def _kf_dev(self, kf: int) -> dict:
        e = self._dev_kf.get(kf)
        if e is None:
            db = self.db
            e = {
                "desc_i8": jnp.asarray(db.kf_desc_i8[kf]),
                "bearing": jnp.asarray(db.kf_bearing[kf]),
                "angle": jnp.asarray(db.kf_angle[kf]),
                "und": jnp.asarray(db.kf_xy_undist[kf]),
                "sigma2": jnp.asarray(
                    self.sigma2[np.clip(db.kf_level[kf], 0,
                                        self.num_levels - 1)]),
            }
            self._dev_kf[kf] = e
        return e

    def _prune_dev_cache(self):
        if len(self._dev_kf) <= len(self.db.valid_kf_ids()) + 64:
            return
        dead = [k for k in self._dev_kf if not self.db.kf_valid[k]]
        for k in dead:
            del self._dev_kf[k]

    def _count_overflow(self, what: str, n: int):
        if what not in self.overflow:
            _log.warning(
                "capacity overflow: %s dropped %d entries (first hit; "
                "counted in System.stats()['overflow'])", what, n)
        self.overflow[what] = self.overflow.get(what, 0) + int(n)

    # ------------------------------------------------------------------
    def after_initialization(self, kf1: int, kf2: int):
        """Tiny full BA on the 2-KF initial map (ref: global BA after init)."""
        self._run_local_ba(kf2)
        for lm in self.db.valid_lm_ids():
            self.recent_lms.append((int(lm), kf2))
        if self.global_optimizer is not None:
            self.global_optimizer.queue_keyframe(kf1)
            self.global_optimizer.queue_keyframe(kf2)

    def after_stereo_initialization(self, kf: int):
        if self.global_optimizer is not None:
            self.global_optimizer.queue_keyframe(kf)

    # synchronous mapping never queues: the tracker's backlog gate is a
    # no-op outside async mode (_AsyncMapperProxy overrides this)
    backlog = 0

    def insert_keyframe(self, frame) -> int:
        """Synchronous insertion: store + full mapping pipeline."""
        import time as _time
        t0 = _time.perf_counter()
        kf = self.store_keyframe(frame)
        self._phase("store", t0)
        self.process_keyframe(kf, run_ba=True)
        return kf

    def store_keyframe(self, frame) -> int:
        """Fast part (runs in the tracking thread, like the reference's
        queue_keyframe): create the KF record + associate tracked landmarks."""
        db = self.db
        kf = db.add_keyframe(frame)
        touched = []
        for i in np.where((frame.lm_idx >= 0) & frame.valid & ~frame.outlier)[0]:
            lm = int(frame.lm_idx[i])
            if not db.lm_valid[lm]:
                continue
            if kf not in db.lm_obs[lm]:
                db.add_observation(lm, kf, int(i))
                db.update_landmark_descriptor(lm)
                touched.append(lm)
        db.update_landmark_geometry_batch(
            touched, self.cfg.feature.scale_factor, self.num_levels)
        if self.stereo:
            self._seed_landmarks_from_depth(frame, kf)
        db.update_connections(kf)
        self._kf_dev(kf)          # pre-warm the device-resident columns
        self._prune_dev_cache()
        return kf

    def process_keyframe(self, kf: int, run_ba: bool = True):
        """Heavy part (the reference's mapping-thread body): cull, create,
        fuse, local BA, cull KFs, forward to global optimization.  `run_ba`
        False implements the abort-on-backlog policy (ref: local BA aborted
        when new keyframes are waiting).  Map mutations run under map_lock
        when one is set (async mode); the BA solve releases it."""
        import time as _time
        lock = self._lock()
        with lock:
            n_lm0 = len(self.db.valid_lm_ids())
            t = _time.perf_counter()
            self.remove_redundant_landmarks(kf)
            t = self._phase("cull_lms", t)
        # triangulate/fuse/BA take the lock internally only around their
        # host-mutation sections; their device calls run UNLOCKED so async
        # tracking finishes never wait on a mapping device round trip
        # (the reference's mutex discipline — ops lock briefly, not the
        # whole mapping iteration)
        t = _time.perf_counter()
        self.create_new_landmarks(kf)
        t = self._phase("triangulate", t)
        self.fuse_duplicated_landmarks(kf)
        self._phase("fuse", t)
        if run_ba:
            t = _time.perf_counter()
            self._run_local_ba(kf)      # takes/releases the lock internally
            self._phase("local_ba", t)
        # keyframe redundancy: snapshot under the lock, histogram pass
        # unlocked, erase under the lock (r5: the inline variant held the
        # lock for its full 380 ms/KF host pass — 208 s on the city run)
        t = _time.perf_counter()
        with lock:
            snap = self.snapshot_redundant_kfs(kf)
        if snap is not None:
            victims = self.compute_redundant_kfs(snap)
            with lock:
                self.apply_redundant_kfs(snap, victims)
        self._phase("cull_kfs", t)
        with lock:
            _log.debug(
                "keyframe %d processed: landmarks %d -> %d, local BA %s",
                kf, n_lm0, len(self.db.valid_lm_ids()),
                "ran" if run_ba else "skipped (backlog)")
            if self.global_optimizer is not None:
                t = _time.perf_counter()
                self.global_optimizer.queue_keyframe(kf)
                self._phase("bow_loop", t)

    def _seed_landmarks_from_depth(self, frame, kf: int):
        """Stereo/RGBD keyframes seed landmarks from measured depth for
        unmatched close keypoints (ref keyframe_inserter depth seeding).

        COVERAGE-GATED (r5): each coverage cell receives new seeds only up
        to ``seed_cell_budget`` total coverage (tracked landmarks count
        toward the budget), closest depth first.  History: r3 tried the
        reference's global seed-while-<100-close budget and the fast city
        stress run collapsed 0.775 -> 0.12 tracked — at ~1 m/frame the
        dense LEADING EDGE is what keeps tracking alive.  But uncapped
        seeding re-seeds already-covered cells every keyframe, and 92% of
        all created landmarks were culled within 2 keyframes
        (CITY_BENCH_TPU6: 337k created / 309k culled, most of mapping
        device time wasted).  The per-cell gate keeps the leading edge
        dense (unmapped cells have zero coverage, so they get the full
        budget) while covered cells stop producing doomed duplicates.
        Mapping.seed_cell_budget <= 0 restores uncapped seeding."""
        db = self.db
        thr = getattr(self.cam, "depth_threshold", 40.0)
        has = (
            frame.valid & (frame.depth > 0) & (frame.depth < thr)
            & (db.kf_lm_idx[kf] < 0)
        )
        cand = np.where(has & (frame.bearing[:, 2] > 1e-6))[0]
        budget = self.cfg.mapping.seed_cell_budget
        # danger bypass (r5 A/B): with budget 8 the city run starved its
        # leading edge and lost tracking at frame ~910 (18 inliers); when
        # the keyframe tracks fewer than seed_close_floor CLOSE landmarks,
        # seed uncapped — the reference's seed-while-<100-close rule as a
        # safety floor under the cell gate.
        if budget > 0 and len(cand):
            tracked_idx = np.where(db.kf_lm_idx[kf] >= 0)[0]
            close_tracked = int(
                ((frame.depth[tracked_idx] > 0)
                 & (frame.depth[tracked_idx] < thr)).sum()
            ) if len(tracked_idx) else 0
            if close_tracked < self.cfg.mapping.seed_close_floor:
                budget = 0
        if budget > 0 and len(cand):
            gr, gc = self.cfg.mapping.seed_grid
            ch = self.cam.rows / gr
            cw = self.cam.cols / gc

            def cell_of(xy):
                r = np.minimum((xy[:, 1] // ch).astype(int), gr - 1)
                c = np.minimum((xy[:, 0] // cw).astype(int), gc - 1)
                return r * gc + c

            cover = np.zeros(gr * gc, np.int32)
            tracked = np.where(db.kf_lm_idx[kf] >= 0)[0]
            if len(tracked):
                np.add.at(cover, cell_of(frame.xy[tracked]), 1)
            order = cand[np.argsort(frame.depth[cand])]   # closest first
            cells = cell_of(frame.xy[order])
            keep = []
            for i, c in zip(order, cells):
                if cover[c] < budget:
                    cover[c] += 1
                    keep.append(i)
            skipped = len(cand) - len(keep)
            if skipped:
                self.seeds_skipped += skipped
            cand = np.asarray(keep, dtype=np.int64)
        bz = frame.bearing[:, 2]
        born = []
        for i in cand:
            T = db.kf_pose_cw[kf]
            Xc = frame.bearing[i] * (frame.depth[i] / bz[i])
            Xw = T[:3, :3].T @ (Xc - T[:3, 3])
            lm = db.add_landmark(
                Xw.astype(np.float32), frame.desc_u32[i], frame.desc_i8[i], kf
            )
            db.add_observation(lm, kf, int(i))
            born.append(lm)
            self.recent_lms.append((lm, kf))
        self.lms_created += len(born)
        self.lms_created_seed += len(born)
        db.update_landmark_geometry_batch(
            born, self.cfg.feature.scale_factor, self.num_levels)

    # ------------------------------------------------------------------
    # landmark culling (ref module/local_map_cleaner)
    # ------------------------------------------------------------------
    def remove_redundant_landmarks(self, cur_kf: int):
        db = self.db
        keep = []
        for lm, born in self.recent_lms:
            if not db.lm_valid[lm]:
                continue
            ratio = db.lm_n_found[lm] / max(db.lm_n_visible[lm], 1)
            age = cur_kf - born
            if ratio < 0.25 and age >= 2:
                db.erase_landmark(lm)
                self.lms_culled += 1
                self.culled_ratio += 1
            elif age >= 2 and db.lm_num_obs[lm] <= 2:
                db.erase_landmark(lm)
                self.lms_culled += 1
                self.culled_obs += 1
            elif age >= 3:
                pass          # graduated: stop monitoring
            else:
                keep.append((lm, born))
        self.recent_lms = keep

    # ------------------------------------------------------------------
    # triangulation with covisible keyframes (ref create_new_landmarks)
    # ------------------------------------------------------------------
    def create_new_landmarks(self, kf: int):
        """Snapshot under the map lock, run the device call UNLOCKED, apply
        results under the lock with revalidation (first-wins checks against
        the live kf_lm_idx columns)."""
        db = self.db
        with self._lock():
            if not db.kf_valid[kf]:
                return
            neighbors = db.get_top_covisible(
                kf, self.num_covis_for_triangulation)
            if not neighbors:
                # fall back: previous keyframe
                prev = [k for k in db.valid_kf_ids() if k != kf]
                neighbors = prev[-2:]
            T1 = db.kf_pose_cw[kf].copy()
            c1 = -T1[:3, :3].T @ T1[:3, 3]
            unmatched1 = (db.kf_lm_idx[kf] < 0) & db.kf_kpt_valid[kf]
            median_depth = self._median_scene_depth(kf)
            # baseline-gate the neighbor set on the host, then run robust
            # match + orientation check + checked triangulation against ALL
            # surviving neighbors in ONE device call
            usable = []
            for nb in neighbors:
                T2 = db.kf_pose_cw[nb]
                c2 = -T2[:3, :3].T @ T2[:3, 3]
                baseline = np.linalg.norm(c2 - c1)
                if self.stereo:
                    if baseline < getattr(self.cam, "focal_x_baseline", 0.0) \
                            / max(getattr(self.cam, "fx", 1.0), 1e-9):
                        continue
                elif baseline < (self.cfg.mapping.baseline_dist_thr_ratio
                                 * median_depth):
                    continue
                usable.append(nb)
            if not usable:
                db.update_connections(kf)
                return
            B = max(1, int(self.num_covis_for_triangulation))
            nb_list = (usable + [usable[0]] * B)[:B]
            un2 = np.stack([
                (db.kf_lm_idx[nb] < 0) & db.kf_kpt_valid[nb]
                for nb in nb_list])
            un2[len(usable):] = False                     # padding neighbors
            # immutable keypoint columns ride the device-resident cache —
            # only poses/masks (mutable, small) are uploaded per call
            d1 = self._kf_dev(kf)
            dn = [self._kf_dev(nb) for nb in nb_list]
            poses_nb = np.stack([db.kf_pose_cw[nb] for nb in nb_list]).astype(
                np.float32)
            geom_v = db.geom_version
        idx_all, X_all, ok_all = TO.triangulation_candidates_multi(
            self.cam,
            jnp.asarray(T1, jnp.float32),
            d1["desc_i8"], jnp.asarray(unmatched1),
            d1["bearing"], d1["angle"],
            d1["und"],
            d1["sigma2"],
            jnp.asarray(poses_nb),
            tuple(d["desc_i8"] for d in dn),
            jnp.asarray(un2),
            tuple(d["bearing"] for d in dn),
            tuple(d["angle"] for d in dn),
            tuple(d["und"] for d in dn),
            tuple(d["sigma2"] for d in dn),
            jnp.float32(1e-2),
        )
        idx_all = np.asarray(idx_all)
        X_all = np.asarray(X_all)
        ok_all = np.asarray(ok_all)
        with self._lock():
            if not db.kf_valid[kf]:
                return
            if db.geom_version != geom_v:
                # a whole-map geometry rewrite (global BA / pose graph /
                # loop correction) landed while the call was in flight:
                # the triangulated positions belong to the OLD geometry —
                # discard wholesale (versioned application; the r3
                # revalidate-only variant kept them and corrupted the map)
                self.stale_discards += 1
                _log.debug("triangulation results for KF %d discarded "
                           "(map geometry moved in flight)", kf)
                return
            born = []
            # second-view confirmation (r3 weak: 89% of created landmarks
            # died within 2 keyframes — most triangulation/fusion work was
            # waste).  The multi-neighbor device call already matched every
            # unmatched keypoint against ALL covisible neighbors, so
            # requiring agreement from >=2 neighbors costs nothing extra:
            # only keypoints whose triangulations are confirmed in a second
            # view become landmarks, and they are born with >=3
            # observations (immune to the num_obs<=2 age-2 cull).  With a
            # single usable neighbor (early map) the floor stays 1.
            need = min(2, len(usable))
            live_nb = [b for b, nb in enumerate(usable) if db.kf_valid[nb]]
            hits = np.zeros(idx_all.shape[1], np.int32)
            for b in live_nb:
                hits += (ok_all[b] & (idx_all[b] >= 0)).astype(np.int32)
            for j in np.where(hits >= need)[0]:
                i1 = int(j)
                if db.kf_lm_idx[kf][i1] >= 0:
                    continue          # associated while the call was in flight
                views = []
                for b in live_nb:
                    if ok_all[b][j] and idx_all[b][j] >= 0:
                        nb, i2 = usable[b], int(idx_all[b][j])
                        if db.kf_lm_idx[nb][i2] < 0:
                            views.append((b, nb, i2))
                if len(views) < need:
                    continue
                lm = db.add_landmark(
                    X_all[views[0][0]][j].astype(np.float32),
                    db.kf_desc_u32[kf][i1], db.kf_desc_i8[kf][i1], kf,
                )
                db.add_observation(lm, kf, i1)
                for _, nb, i2 in views:
                    db.add_observation(lm, nb, i2)
                db.update_landmark_descriptor(lm)
                born.append(lm)
                self.recent_lms.append((lm, kf))
            self.lms_created += len(born)
            self.lms_created_tri += len(born)
            db.update_landmark_geometry_batch(
                born, self.cfg.feature.scale_factor, self.num_levels)
            db.update_connections(kf)

    def _median_scene_depth(self, kf: int) -> float:
        db = self.db
        lms = db.kf_lm_idx[kf]
        lms = lms[lms >= 0]
        if len(lms) == 0:
            return 1.0
        T = db.kf_pose_cw[kf]
        pc = (T[:3, :3] @ db.lm_pos[lms].T).T + T[:3, 3]
        z = pc[:, 2]
        z = z[z > 0]
        return float(np.median(z)) if len(z) else 1.0

    # ------------------------------------------------------------------
    # duplicate fusion (ref update_new_keyframe / match::fuse)
    # ------------------------------------------------------------------
    def fuse_duplicated_landmarks(self, kf: int):
        """Same snapshot/unlocked-call/locked-apply structure as
        create_new_landmarks."""
        db = self.db
        with self._lock():
            if not db.kf_valid[kf]:
                return
            targets = db.get_top_covisible(
                kf, self.cfg.mapping.num_covisibilities_for_landmark_fusion)
            own = db.kf_lm_idx[kf]
            own_lms = own[own >= 0]
            if len(own_lms) == 0 or not targets:
                return
            Lcap = 4096
            n = min(len(own_lms), Lcap)
            lm_ids = own_lms[:n].copy()
            pos = np.zeros((Lcap, 3), np.float32)
            desc = np.zeros((Lcap, 256), np.int8)
            valid = np.zeros(Lcap, bool)
            pos[:n] = db.lm_pos[lm_ids]
            desc[:n] = db.lm_desc_i8[lm_ids]
            valid[:n] = True
            pred = np.full(Lcap, -1, np.int32)
            # ALL covisible targets in ONE device call (padded to the
            # configured cap so the program compiles once)
            B = max(1, int(
                self.cfg.mapping.num_covisibilities_for_landmark_fusion))
            nb_list = (targets + [targets[0]] * B)[:B]
            poses = np.stack([db.kf_pose_cw[nb] for nb in nb_list]).astype(
                np.float32)
            dn = [self._kf_dev(nb) for nb in nb_list]
            kvals = np.stack([db.kf_kpt_valid[nb] for nb in nb_list])
            kvals[len(targets):] = False                  # padding neighbors
            klvls = np.stack([db.kf_level[nb] for nb in nb_list])
            geom_v = db.geom_version
        idx_all = np.asarray(TO.fuse_candidates_multi(
            self.cam, jnp.asarray(poses),
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid),
            tuple(d["desc_i8"] for d in dn),
            tuple(d["und"] for d in dn),
            jnp.asarray(kvals), jnp.asarray(klvls),
            jnp.float32(3.0), jnp.asarray(self.scale_factors),
            jnp.asarray(pred),
        )[0])
        touched = set()
        with self._lock():
            if not db.kf_valid[kf]:
                return
            if db.geom_version != geom_v:
                # geometry rewrite in flight — the projections that matched
                # were computed against the old poses; discard (versioned
                # application, see create_new_landmarks)
                self.stale_discards += 1
                _log.debug("fusion results for KF %d discarded (map "
                           "geometry moved in flight)", kf)
                return
            for b, nb in enumerate(targets):
                if not db.kf_valid[nb]:
                    continue
                idx = idx_all[b]
                for j in np.where(idx >= 0)[0]:
                    if j >= n:
                        continue
                    lm = int(lm_ids[j])
                    if not db.lm_valid[lm]:
                        continue
                    kpt = int(idx[j])
                    other = int(db.kf_lm_idx[nb][kpt])
                    if other >= 0 and db.lm_valid[other]:
                        if other != lm:
                            # merge the one with fewer observations in
                            if db.lm_num_obs[lm] >= db.lm_num_obs[other]:
                                db.replace_landmark(other, lm)
                            else:
                                db.replace_landmark(lm, other)
                    else:
                        db.add_observation(lm, nb, kpt)
                        touched.add(lm)
            # representative descriptors once per touched landmark
            for lm in touched:
                if db.lm_valid[lm]:
                    db.update_landmark_descriptor(lm)
            db.update_connections(kf)

    # ------------------------------------------------------------------
    # local BA (ref optimize/local_bundle_adjuster)
    # ------------------------------------------------------------------
    def _run_local_ba(self, kf: int):
        lock = self._lock()
        with lock:
            built = self._build_ba_problem(kf)
            geom_v = self.db.geom_version
        if built is None:
            return
        prob, cam_index, lm_index, cam_opt, obs_refs, n_obs, lm_ids, multicam = built
        solver = self._multicam_local_ba() if multicam else self.local_ba
        import time as _time
        _t0 = _time.perf_counter()
        res = solver(prob)                 # jitted solve — outside the lock
        self.ba_runs += 1
        self.ba_iters_total += self.ba_first_iters + self.ba_second_iters
        self.ba_wall_s += _time.perf_counter() - _t0
        with lock:
            if self.db.geom_version != geom_v:
                # optimized against pre-rewrite geometry — discard rather
                # than clobber the loop correction / global BA that landed
                self.stale_discards += 1
                _log.debug("local BA result for KF %d discarded (map "
                           "geometry moved in flight)", kf)
                return
            self._apply_ba_result(res, cam_index, lm_index, cam_opt,
                                  obs_refs, n_obs, lm_ids)
            self.db.version += 1

    def _multicam_local_ba(self):
        if self._local_ba_multicam is None:
            self._local_ba_multicam = shared_local_ba(
                self.cam, multicam=True, first_iters=self.ba_first_iters,
                second_iters=self.ba_second_iters)
        return self._local_ba_multicam

    def _build_ba_problem(self, kf: int):
        db = self.db
        local = [kf] + db.get_top_covisible(kf, self.C - 1)
        local = [k for k in local if db.kf_valid[k]]
        if not local:
            return None       # the keyframe was culled before its BA ran
        local_set = set(local)
        # landmarks of local KFs: one vectorized pass over their lm columns
        cat = np.concatenate([db.kf_lm_idx[k] for k in local])
        cat = cat[cat >= 0]
        lm_all = np.unique(cat)
        lm_all = lm_all[db.lm_valid[lm_all]]
        if len(lm_all) > self.L:
            self._count_overflow("ba_lms", len(lm_all) - self.L)
        lm_ids = [int(l) for l in lm_all[: self.L]]
        # fixed KFs: other observers of those landmarks, via the flat table
        lm_lookup = np.full(db.n_lms, -1, np.int32)
        lm_lookup[lm_ids] = np.arange(len(lm_ids), dtype=np.int32)
        t_lm, t_kf, t_kpt, t_u, t_v, t_xr, t_lvl = db.observation_rows()
        ol_all = lm_lookup[np.clip(t_lm, 0, db.n_lms - 1)]
        sel = (t_lm >= 0) & (ol_all >= 0)
        observers = np.unique(t_kf[sel])
        fixed = [int(k) for k in observers
                 if k not in local_set and db.kf_valid[k]]
        # cap total cameras at C: prefer all local, then fixed by recency
        n_local = len(local)
        max_fixed = self.C - n_local
        fixed = sorted(fixed, reverse=True)[:max_fixed]
        cams = local + fixed
        cam_index = {k: i for i, k in enumerate(cams)}
        lm_index = {lm: i for i, lm in enumerate(lm_ids)}

        C, L, O = self.C, self.L, self.O
        T = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        cam_opt = np.zeros(C, bool)
        cam_valid = np.zeros(C, bool)
        for k, i in cam_index.items():
            T[i] = db.kf_pose_cw[k]
            cam_valid[i] = True
            cam_opt[i] = (k in local_set) and (k != db.origin_kf)
        # keep gauge: if every cam would be free, fix the oldest
        if cam_opt.all():
            cam_opt[cam_index[min(cams)]] = False
        X = np.zeros((L, 3), np.float32)
        lm_valid = np.zeros(L, bool)
        for lm, i in lm_index.items():
            X[i] = db.lm_pos[lm]
            lm_valid[i] = True
        # merged-session windows may span keyframes from different cameras:
        # per-observation intrinsics ride in obs columns 2.. (ref: g2o edges
        # carry their keyframe's camera).  The multicam edge is monocular, so
        # x_right is dropped for such windows.
        kf_cam_names = {db.kf_camera[int(k)] for k in cams}
        multicam = len(kf_cam_names - {None}) > 1
        camv_by_kf = {}
        if multicam:
            from ..optimize import residuals as R2
            from ..camera.base import camera_to_config
            for k in cams:
                name = db.kf_camera[int(k)]
                if name is not None and name in db.cameras:
                    camv_by_kf[k] = R2.make_camv(db.cameras[name])
                else:
                    camv_by_kf[k] = R2.make_camv(camera_to_config(self.cam))
            D = 2 + R2.CAMV_DIM
        else:
            D = 3 if self.stereo else 2
        oc = np.zeros(O, np.int32)
        ol = np.zeros(O, np.int32)
        ouv = np.zeros((O, D), np.float32)
        osg = np.ones(O, np.float32)
        om = np.zeros(O, bool)
        # observation packing: gather rows of the flat table whose landmark
        # AND keyframe are both in the window (no per-observation Python)
        cam_lookup = np.full(db.n_kfs, -1, np.int32)
        cam_lookup[cams] = np.arange(len(cams), dtype=np.int32)
        oc_all = cam_lookup[np.clip(t_kf, 0, db.n_kfs - 1)]
        rows = np.where(sel & (oc_all >= 0))[0]
        if len(rows) > O:
            self._count_overflow("ba_obs", len(rows) - O)
            rows = rows[:O]
        n_obs = len(rows)
        if n_obs < 10:
            return None
        oc[:n_obs] = oc_all[rows]
        ol[:n_obs] = ol_all[rows]
        ouv[:n_obs, 0] = t_u[rows]
        ouv[:n_obs, 1] = t_v[rows]
        if multicam:
            camv_arr = np.zeros((self.C, R2.CAMV_DIM), np.float32)
            for k, i in cam_index.items():
                camv_arr[i] = camv_by_kf[k]
            ouv[:n_obs, 2:] = camv_arr[oc[:n_obs]]
        elif self.stereo:
            ouv[:n_obs, 2] = t_xr[rows]
        osg[:n_obs] = self.sigma2[np.clip(t_lvl[rows], 0,
                                          self.num_levels - 1)]
        om[:n_obs] = True
        obs_refs = (t_lm[rows].copy(), t_kf[rows].copy())
        prob = BAProblem(
            jnp.asarray(T), jnp.asarray(cam_opt), jnp.asarray(cam_valid),
            jnp.asarray(X), jnp.asarray(lm_valid),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
            jnp.asarray(osg), jnp.asarray(om),
        )
        return (prob, cam_index, lm_index, cam_opt, obs_refs, n_obs, lm_ids,
                multicam)

    def _apply_ba_result(self, res, cam_index, lm_index, cam_opt,
                         obs_refs, n_obs, lm_ids):
        db = self.db
        T_new = np.asarray(res.T_cw)
        X_new = np.asarray(res.X)
        inl = np.asarray(res.obs_inlier)
        for k, i in cam_index.items():
            if cam_opt[i]:
                db.kf_pose_cw[k] = T_new[i]
        for lm, i in lm_index.items():
            if db.lm_valid[lm]:
                db.lm_pos[lm] = X_new[i]
        # remove outlier observations (obs_refs: parallel (lm, kf) arrays)
        ref_lm, ref_kf = obs_refs
        for j in np.where(~inl[:n_obs])[0]:
            db.erase_observation(int(ref_lm[j]), int(ref_kf[j]))
        db.update_landmark_geometry_batch(
            lm_ids, self.cfg.feature.scale_factor, self.num_levels)

    # ------------------------------------------------------------------
    # keyframe culling (ref remove_redundant_keyframes: 90% rule)
    # ------------------------------------------------------------------
    def remove_redundant_keyframes(self, cur_kf: int):
        """A keyframe is redundant when >=90% of its landmarks are seen by
        >=3 other keyframes at the same or finer scale.  Vectorized: one pass
        over the flat observation table builds a per-landmark histogram of
        observation levels; each candidate's "seen better elsewhere" counts
        are then cumulative-histogram lookups (was a triple Python loop).

        Inline variant (sync mode / direct calls): holds whatever lock the
        caller holds.  The async pipeline uses snapshot_redundant_kfs /
        compute_redundant_kfs / apply_redundant_kfs instead so the
        histogram pass runs WITHOUT the map lock (r5: 208 s of lock-held
        host work on the 4,000-frame city run — a top track-stall source)."""
        snap = self.snapshot_redundant_kfs(cur_kf)
        if snap is None:
            return
        victims = self.compute_redundant_kfs(snap)
        self.apply_redundant_kfs(snap, victims)

    def snapshot_redundant_kfs(self, cur_kf: int):
        """Copy what the redundancy pass reads (caller holds the lock)."""
        db = self.db
        cands = [k for k in db.get_top_covisible(cur_kf, 30)
                 if k != db.origin_kf and k != cur_kf and db.kf_valid[k]]
        if not cands:
            return None
        return {
            "geom_version": db.geom_version,
            "cands": cands,
            "obs_lm": db.obs_lm[: db.n_obs_rows].copy(),
            "obs_level": db.obs_level[: db.n_obs_rows].copy(),
            "n_lms": db.n_lms,
            "lm_valid": db.lm_valid.copy(),
            "kf_lm_idx": {k: db.kf_lm_idx[k].copy() for k in cands},
            "kf_level": {k: db.kf_level[k].copy() for k in cands},
        }

    def compute_redundant_kfs(self, snap) -> list:
        """Pure host compute on the snapshot — no lock, no db access."""
        NLV = max(self.num_levels + 2, 2)
        t_lm = snap["obs_lm"]
        t_lvl = np.clip(snap["obs_level"], 0, NLV - 1)
        live = t_lm >= 0
        flat = np.bincount(
            t_lm[live].astype(np.int64) * NLV + t_lvl[live],
            minlength=snap["n_lms"] * NLV)
        hist = np.cumsum(
            flat.reshape(snap["n_lms"], NLV), axis=1)   # cum over levels
        victims = []
        # histogram staleness across multiple victims is acceptable here:
        # the apply step erases at most one keyframe per snapshot (the
        # inline variant rebuilt the histogram after every erase; erasing
        # one per mapping iteration converges to the same set a few KFs
        # later and keeps the locked apply O(1))
        for k in snap["cands"]:
            arr = snap["kf_lm_idx"][k]
            kpts = np.where(arr >= 0)[0]
            if len(kpts) < 10:
                continue
            lms = arr[kpts]
            ok_lm = snap["lm_valid"][lms]
            my_level = np.clip(snap["kf_level"][k][kpts].astype(np.int64) + 1,
                               0, NLV - 1)
            # observations at level <= my_level+1 excluding this KF's own
            n_better = hist[lms, my_level] - 1
            n_redundant = int(((n_better >= 3) & ok_lm).sum())
            if n_redundant > self.cfg.mapping.redundant_obs_ratio_thr * len(kpts):
                victims.append(k)
                break
        return victims

    def apply_redundant_kfs(self, snap, victims: list):
        """Erase the computed victims (caller holds the lock).  Discard if a
        whole-map geometry rewrite landed since the snapshot (versioned
        application, same discipline as triangulate/fuse/local-BA)."""
        db = self.db
        if db.geom_version != snap["geom_version"]:
            self.stale_discards += 1
            return
        for k in victims:
            if db.kf_valid[k]:
                db.erase_keyframe(k)
                self.kfs_culled += 1
