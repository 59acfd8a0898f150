"""Concurrent multi-session SLAM with pooled, landmark-sharded distributed BA.

BASELINE.json config #5 ("KITTI 00+02+05 concurrent sessions, sharded map,
distributed BA on N>=2 hosts").  The reference is single-process and has no
distributed runtime (SURVEY.md §2.3); this subsystem is the from-scratch
TPU-native design the north star mandates:

* K SLAM sessions run concurrently (round-robin frame interleaving — the
  single-chip analog of one session per host; each session's mapping module
  may additionally run async on its own thread).
* Their maps pool into ONE bundle-adjustment problem: cameras concatenated
  with per-session index offsets (each session's origin keyframe pinned for
  gauge), landmarks concatenated then block-sharded over the device mesh.
* `parallel.distributed_ba` solves it: per-shard Schur elimination of the
  landmark blocks, reduced camera system assembled with psum over ICI/DCN.
* Results are written back into every session's live map with the same
  born-during-BA propagation the in-session global BA uses.

Sessions with different cameras are supported: the pooled solve switches to
the per-observation-intrinsics residual (optimize.residuals multicam edge).
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..camera.base import SetupType, camera_to_config
from ..module.global_optimization_module import apply_ba_writeback
from ..optimize import residuals as R
from ..optimize.ba import BAProblem
from .distributed_ba import make_distributed_ba, partition_problem
from .mesh import make_mesh

log = logging.getLogger(__name__)


class MultiSessionRunner:
    """Drives K `System` sessions concurrently and bundle-adjusts their
    pooled map with the landmark-sharded distributed solver.

    systems:   constructed (not yet started) or running System instances.
    mesh:      jax.sharding.Mesh for the pooled BA (default: all devices).
    n_shards:  landmark shards for the pooled BA (default: mesh size).
    """

    def __init__(self, systems: Sequence, mesh=None, n_shards: Optional[int] = None):
        self.systems = list(systems)
        if mesh is None:
            mesh = make_mesh(n_shards)
        self.mesh = mesh
        self.n_shards = n_shards or mesh.devices.size
        self._ba_cache: Dict[tuple, object] = {}
        self.joint_ba_runs = 0
        self.failed: List[int] = []    # sessions dropped by run() on error

    # ------------------------------------------------------------------
    def startup(self):
        for s in self.systems:
            if not getattr(s, "_running", False):
                s.startup()

    def shutdown(self):
        for s in self.systems:
            s.shutdown()

    def run(self, frame_iters: Sequence, joint_ba_every: int = 0,
            joint_ba_iters: int = 8, pipeline: bool = False,
            pipeline_depth: int = 1) -> List[List[bool]]:
        """Round-robin the sessions' frame streams until all are exhausted.

        frame_iters[i] yields the argument tuple for session i's feed method
        (selected by its camera setup: monocular -> feed_monocular_frame,
        stereo -> feed_stereo_frame, RGBD -> feed_RGBD_frame).

        joint_ba_every: if >0, run the pooled distributed BA every that many
        total fed frames (and once at the end).  Returns per-session lists of
        per-frame tracked flags.

        pipeline: drive each session through System.feed_sequence and
        interleave the generators — session i's device step then overlaps
        the OTHER sessions' host bookkeeping on top of feed_sequence's own
        one-frame overlap (a K-deep software pipeline across sessions; by
        the time the round-robin returns to a session, its in-flight result
        has usually finished computing and copied back).
        """
        self.startup()
        tracked: List[List[bool]] = [[] for _ in self.systems]
        total = 0
        if pipeline:
            streams = [
                s.feed_sequence(iter(f), kind=s.feed_kind(),
                                depth=pipeline_depth)
                for s, f in zip(self.systems, frame_iters)
            ]
        else:
            feeds = [s.feed_frame for s in self.systems]
            iters = [iter(f) for f in frame_iters]
        live = [True] * len(self.systems)
        self.failed = []
        while any(live):
            for i in range(len(self.systems)):
                if not live[i]:
                    continue
                try:
                    if pipeline:
                        _ts, pose = next(streams[i])
                    else:
                        pose = feeds[i](*next(iters[i]))
                except StopIteration:
                    live[i] = False
                    continue
                except Exception:
                    # session dropout (SURVEY.md §5.3): a dying session must
                    # not take the fleet down — drop it, keep the surviving
                    # sessions tracking and the pooled BA running.  Its map
                    # stays in the pool as-is (resumable later from an
                    # autosave snapshot via elastic recovery).
                    log.exception("session %d failed; continuing with the "
                                  "surviving sessions", i)
                    live[i] = False
                    self.failed.append(i)
                    continue
                tracked[i].append(pose is not None)
                total += 1
                if joint_ba_every and total % joint_ba_every == 0:
                    self.joint_bundle_adjust(iters=joint_ba_iters)
        if joint_ba_every:
            self.joint_bundle_adjust(iters=joint_ba_iters)
        return tracked

    @staticmethod
    def _kind(system) -> str:
        setup = system.cam.setup
        if setup == SetupType.STEREO:
            return "stereo"
        if setup == SetupType.RGBD:
            return "rgbd"
        return "monocular"

    @staticmethod
    def _feed_fn(system):
        setup = system.cam.setup
        if setup == SetupType.STEREO:
            return system.feed_stereo_frame
        if setup == SetupType.RGBD:
            return system.feed_RGBD_frame
        return system.feed_monocular_frame

    # ------------------------------------------------------------------
    def snapshot_problem(self) -> Optional[dict]:
        return pool_sessions(self.systems)


def pool_sessions(systems: Sequence) -> Optional[dict]:
    """Pool every session's map into one padded BAProblem.

    Camera slots are concatenated per session (origin keyframes fixed for
    gauge); landmark slots concatenated; observations carry per-obs
    intrinsics when the sessions' cameras differ.  Taken under each
    session's map lock.  Returns None if the pooled map is too small.
    Module-level so the multihost pool (multi_session_multihost) reuses the
    same pooling for its per-process half of the problem.
    """
    snaps = []
    cam_specs = set()
    all_stereo = all(s.cam.setup != SetupType.MONOCULAR for s in systems)
    for s in systems:
        with s.map_lock:
            db = s.map_db
            kf_ids = [int(k) for k in db.valid_kf_ids()]
            lm_ids = [int(l) for l in db.valid_lm_ids()]
            snap = {
                "sys": s,
                "kf_ids": kf_ids,
                "lm_ids": lm_ids,
                "kf_pose": {k: db.kf_pose_cw[k].copy() for k in kf_ids},
                "lm_pos": {l: db.lm_pos[l].copy() for l in lm_ids},
                "obs": [],
                "origin": db.origin_kf,
            }
            # vectorized gather from the flat observation table (rows
            # whose landmark AND keyframe are both live)
            sigma2 = s.global_optimizer.sigma2
            t_lm, t_kf, t_kpt, t_u, t_v, t_xr, t_lvl = \
                db.observation_rows()
            live = (t_lm >= 0) & db.kf_valid[np.clip(t_kf, 0, None)]
            rows = np.where(live)[0]
            snap["obs"] = {
                "kf": t_kf[rows].copy(), "lm": t_lm[rows].copy(),
                "u": t_u[rows].copy(), "v": t_v[rows].copy(),
                "sg": sigma2[np.clip(t_lvl[rows], 0,
                                     len(sigma2) - 1)].astype(np.float32),
                "xr": (t_xr[rows].copy() if all_stereo
                       else np.full(len(rows), -1.0, np.float32)),
            }
            snaps.append(snap)
        spec = camera_to_config(s.cam)
        cam_specs.add(tuple(sorted(
            (k, v) for k, v in spec.items() if not isinstance(v, (list, dict))
        )))

    n_c = sum(len(sn["kf_ids"]) for sn in snaps)
    n_l = sum(len(sn["lm_ids"]) for sn in snaps)
    n_o = sum(len(sn["obs"]["kf"]) for sn in snaps)
    if n_c < 3 or n_l < 30 or n_o < 60:
        return None
    multicam = len(cam_specs) > 1
    # stereo edges (u, v, u_right) only when every session is stereo/RGBD
    # and they share one camera (the multicam edge is monocular)
    stereo = all_stereo and not multicam

    C = max(8, 1 << int(np.ceil(np.log2(n_c))))
    L = max(64, 1 << int(np.ceil(np.log2(n_l))))
    O = max(256, 1 << int(np.ceil(np.log2(n_o))))
    D = 2 + R.CAMV_DIM if multicam else (3 if stereo else 2)

    T = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    cam_opt = np.zeros(C, bool)
    cam_valid = np.zeros(C, bool)
    X = np.zeros((L, 3), np.float32)
    lm_valid = np.zeros(L, bool)
    oc = np.zeros(O, np.int32)
    ol = np.zeros(O, np.int32)
    ouv = np.zeros((O, D), np.float32)
    osg = np.ones(O, np.float32)
    om = np.zeros(O, bool)

    cam_off = 0
    lm_off = 0
    n_obs = 0
    per_session = []
    for sn in snaps:
        cam_index = {k: cam_off + i for i, k in enumerate(sn["kf_ids"])}
        lm_index = {l: lm_off + i for i, l in enumerate(sn["lm_ids"])}
        camv = R.make_camv(camera_to_config(sn["sys"].cam)) if multicam else None
        for k, i in cam_index.items():
            T[i] = sn["kf_pose"][k]
            cam_valid[i] = True
            cam_opt[i] = k != sn["origin"]
        for l, i in lm_index.items():
            X[i] = sn["lm_pos"][l]
            lm_valid[i] = True
        ob = sn["obs"]
        db = sn["sys"].map_db
        cam_lookup = np.full(db.n_kfs, -1, np.int32)
        for k, i in cam_index.items():
            cam_lookup[k] = i
        lm_lookup = np.full(db.n_lms, -1, np.int32)
        for l, i in lm_index.items():
            lm_lookup[l] = i
        oc_s = cam_lookup[np.clip(ob["kf"], 0, db.n_kfs - 1)]
        ol_s = lm_lookup[np.clip(ob["lm"], 0, db.n_lms - 1)]
        sel = np.where((oc_s >= 0) & (ol_s >= 0))[0][: O - n_obs]
        m = len(sel)
        sl = slice(n_obs, n_obs + m)
        oc[sl] = oc_s[sel]
        ol[sl] = ol_s[sel]
        ouv[sl, 0] = ob["u"][sel]
        ouv[sl, 1] = ob["v"][sel]
        if multicam:
            ouv[sl, 2:] = camv
        elif stereo:
            ouv[sl, 2] = ob["xr"][sel]
        osg[sl] = ob["sg"][sel]
        om[sl] = True
        n_obs += m
        per_session.append({
            "sys": sn["sys"], "cam_index": cam_index, "lm_index": lm_index,
        })
        cam_off += len(sn["kf_ids"])
        lm_off += len(sn["lm_ids"])

    prob = BAProblem(
        jnp.asarray(T), jnp.asarray(cam_opt), jnp.asarray(cam_valid),
        jnp.asarray(X), jnp.asarray(lm_valid),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.asarray(osg), jnp.asarray(om),
    )
    return {
        "prob": prob, "per_session": per_session, "multicam": multicam,
        "stereo": stereo, "cam_opt": cam_opt, "shapes": (C, L, O, D),
    }

    def joint_bundle_adjust(self, iters: int = 10) -> Optional[float]:
        """Snapshot -> sharded solve over the mesh -> write back.

        Returns the final pooled robust cost, or None if skipped (map too
        small).  The solve runs outside the map locks; write-back re-locks
        each session and propagates born-during keyframes/landmarks.
        """
        built = self.snapshot_problem()
        if built is None:
            return None
        shards = int(self.mesh.devices.size)   # shard count must match the mesh
        sp = partition_problem(built["prob"], shards)
        key = (
            built["shapes"], shards, built["multicam"], built["stereo"],
            sp.X.shape[0], sp.obs_cam.shape[0], iters,
        )
        if key not in self._ba_cache:
            self._ba_cache[key] = make_distributed_ba(
                self.systems[0].cam, self.mesh, stereo=built["stereo"],
                iters=iters,
                res_fn_override=(
                    R.make_multicam_mono_residual() if built["multicam"] else None),
            )
        T_out, X_out, cost = self._ba_cache[key](sp)
        T_out = np.asarray(T_out)
        X_out = np.asarray(X_out)
        for ps in built["per_session"]:
            s = ps["sys"]
            with s.map_lock:
                apply_ba_writeback(
                    s.map_db, ps["cam_index"], ps["lm_index"],
                    built["cam_opt"], T_out, X_out,
                )
                s.map_db.version += 1
        self.joint_ba_runs += 1
        return float(cost)
