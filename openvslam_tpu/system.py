"""System facade (ref ``system.h/.cc``): owns modules + databases, exposes
startup/shutdown, feed_*_frame, trajectory/map IO, pause/reset controls.

The reference runs mapping and global optimization in their own std::threads
with queue handoff (SURVEY.md §2.3).  Here tracking runs synchronously in the
caller (same as the reference) and the mapping/global-opt stages run through
an optional thread-pool executor with the same observable contract (tracking
never blocks on BA; see module docs).  Default is synchronous (deterministic
for tests); pass ``async_mapping=True`` for the pipelined mode.
"""
from __future__ import annotations

import collections
import concurrent.futures
import threading
import time
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from .camera.base import SetupType
from .utils.log import get_logger

_log = get_logger("system")
from .config import Config
from .data import Frame, MapDatabase
from .models.frontend import OrbFrontend
from .module.mapping_module import MappingModule
from .module.tracking_module import TrackingModule, TrackerState
from .io import trajectory_io
from .publish import FramePublisher, MapPublisher


def equalize_histogram(img: np.ndarray) -> np.ndarray:
    """Global histogram equalization (ref util::image_converter option)."""
    hist = np.bincount(img.reshape(-1), minlength=256)
    cdf = np.cumsum(hist).astype(np.float64)
    nz = cdf[cdf > 0]
    if len(nz) == 0:
        return img
    cdf_min = nz[0]
    lut = np.clip(
        np.round((cdf - cdf_min) / max(cdf[-1] - cdf_min, 1) * 255), 0, 255
    ).astype(np.uint8)
    return lut[img]


class System:
    def __init__(self, cfg: Config, vocab_path: Optional[str] = None,
                 async_mapping: bool = False):
        self.cfg = cfg
        self.cam = cfg.camera
        self.frontend = OrbFrontend.shared(
            rows=self.cam.rows, cols=self.cam.cols,
            max_keypts=cfg.feature.max_num_keypts,
            num_levels=cfg.feature.num_levels,
            scale_factor=cfg.feature.scale_factor,
            ini_fast_thr=cfg.feature.ini_fast_threshold,
            min_fast_thr=cfg.feature.min_fast_threshold,
            pattern=cfg.feature.descriptor_pattern,
        )
        self.map_db = MapDatabase(kpt_capacity=self.frontend.capacity)
        # register this session's camera in the map's camera database
        from .camera.base import camera_to_config
        self.camera_name = self.map_db.register_camera(
            cfg.raw.get("Camera", {}).get("name", "default"),
            camera_to_config(self.cam), make_default=True,
        )
        # Always build the BoW stack (ref: a vocabulary file is mandatory):
        # vocab_path None uses the built-in default vocabulary, so every
        # session has relocalization; loop detection stays gated by
        # cfg.loop.enabled inside the module.
        from .module.global_optimization_module import GlobalOptimizationModule
        # stereo/RGBD fixes the Sim3 scale in loop validation/correction
        # (ref: sim3_solver fix_scale for non-monocular setups)
        self.global_optimizer = GlobalOptimizationModule(
            cfg, self.cam, self.map_db, vocab_path,
            fix_scale=self.cam.setup != SetupType.MONOCULAR,
        )
        self.mapper = MappingModule(
            cfg, self.cam, self.map_db, global_optimizer=self.global_optimizer
        )
        self.map_lock = threading.RLock()
        self.global_optimizer.map_lock = self.map_lock
        self.global_optimizer.async_global_ba = async_mapping
        tracker_mapper = self.mapper
        if async_mapping:
            self.mapper.map_lock = self.map_lock
            tracker_mapper = _AsyncMapperProxy(self.mapper, self.map_lock)
            # loop detection/validation/correction on its own worker (ref:
            # the global optimization module is the third thread); the
            # worker pauses the mapper via the proxy during corrections
            self.global_optimizer.mapper_proxy = tracker_mapper
            self.global_optimizer.start_loop_worker()
        self._tracker_mapper = tracker_mapper
        # feed-path backpressure accounting (observable in stats())
        self._pace_waits = 0
        self._pace_wait_s = 0.0
        self._pace_wait_max = 0.0
        self.tracker = TrackingModule(
            cfg, self.cam, self.map_db, mapper=tracker_mapper,
            relocalizer=getattr(self.global_optimizer, "relocalizer", None),
        )
        if self.global_optimizer is not None:
            self.tracker.relocalizer = self.global_optimizer.relocalizer
        self.frame_publisher = FramePublisher()
        self.map_publisher = MapPublisher(self.map_db)
        # static mask from Feature.mask_rectangles ([y0,y1,x0,x1] ratios)
        self._static_mask = None
        if cfg.feature.mask_rectangles:
            m = np.ones((self.cam.rows, self.cam.cols), np.float32)
            for y0, y1, x0, x1 in cfg.feature.mask_rectangles:
                m[int(y0 * self.cam.rows):int(y1 * self.cam.rows),
                  int(x0 * self.cam.cols):int(x1 * self.cam.cols)] = 0.0
            self._static_mask = m
        # fused per-frame tracking program (one device call on the common
        # path; OPENVSLAM_TPU_FUSED=0 forces the unfused module calls)
        import os
        self._track_step = None
        if os.environ.get("OPENVSLAM_TPU_FUSED", "1") != "0":
            from .models.track_step import TrackStep
            mode = {SetupType.MONOCULAR: "mono", SetupType.STEREO: "stereo",
                    SetupType.RGBD: "rgbd"}.get(self.cam.setup, "mono")
            self._track_step = TrackStep.shared(
                self.cam, self.frontend,
                lm_capacity=TrackingModule.LOCAL_LM_CAP, mode=mode,
            )
        self.frame_id = 0
        self._fused_frames = 0
        self._autosave = None
        self.trajectory: List[tuple] = []   # (timestamp, pose_cw or None)
        # per-frame reference-keyframe anchor (ref trajectory_io: frame
        # poses are recorded RELATIVE to their reference keyframe so loop /
        # BA corrections that move keyframes after the frame was tracked
        # reach the frame trajectory retroactively): (ref_kf, T_rel) or None
        self.traj_ref: List[Optional[tuple]] = []
        self.track_times: List[float] = []  # per-frame wall time (ref track_times)
        self.mapping_enabled = True
        self._async = async_mapping
        self._pending = None
        self._running = False

    # ------------------------------------------------------------------
    def startup(self):
        self._running = True
        _log.info("system startup (%s, %dx%d, %s mapping)",
                  self.cam.setup.name.lower(), self.cam.cols, self.cam.rows,
                  "async" if self._async else "sync")
        # compile the cold-path programs (relocalization stage 1) in the
        # background so their first mid-run use pays no compile stall
        # (utils.prewarm; disabled under OPENVSLAM_TPU_PREWARM=0)
        if self.global_optimizer is not None:
            from .utils.prewarm import prewarmer
            reloc = self.global_optimizer.relocalizer
            K = self.frontend.capacity
            prewarmer().submit(f"reloc_stage1_K{K}",
                               lambda: reloc.prewarm(K))

    def shutdown(self):
        if self._async and isinstance(self._tracker_mapper, _AsyncMapperProxy):
            self._tracker_mapper.drain()
        if self.global_optimizer is not None:
            # drain the loop worker AFTER the mapper (mapping enqueues loop
            # checks), BEFORE joining the global BA it may dispatch
            self.global_optimizer.stop_loop_worker()
            self.global_optimizer.join_global_ba(timeout=120)
        self.tracker.close()
        self._running = False
        _log.info("system shutdown: %d frames, %d keyframes, %d landmarks",
                  len(self.trajectory), self.map_db.n_kfs,
                  len(self.map_db.valid_lm_ids()))

    def enable_mapping_module(self):
        _log.info("mapping module enabled")
        self.mapping_enabled = True
        self.tracker.mapper = self._tracker_mapper

    def disable_mapping_module(self):
        """Localization mode: map frozen, tracker-only (ref §3.5)."""
        _log.info("mapping module disabled (localization mode)")
        self.mapping_enabled = False
        self.tracker.mapper = None

    def pause_other_threads(self):
        """Pause the mapping worker (ref system::pause_other_threads); no-op
        in synchronous mode where there is nothing to pause."""
        if self._async and isinstance(self._tracker_mapper, _AsyncMapperProxy):
            self._tracker_mapper.pause()

    def resume_other_threads(self):
        if self._async and isinstance(self._tracker_mapper, _AsyncMapperProxy):
            self._tracker_mapper.resume()

    def abort_loop_BA(self):
        """Abort a pending global BA (ref system::abort_loop_BA)."""
        if self.global_optimizer is not None:
            self.global_optimizer.abort_global_ba = True

    def enable_loop_detector(self):
        """(ref system::enable_loop_detector)"""
        if self.global_optimizer is not None:
            self.global_optimizer.loop_enabled = True

    def disable_loop_detector(self):
        if self.global_optimizer is not None:
            self.global_optimizer.loop_enabled = False

    def loop_detector_is_enabled(self) -> bool:
        return (self.global_optimizer is not None
                and self.global_optimizer.loop_enabled)

    def loop_BA_is_running(self) -> bool:
        if self.global_optimizer is None:
            return False
        return self.global_optimizer.loop_BA_is_running()

    def request_reset(self):
        _log.info("map reset requested")
        self.map_db = MapDatabase(kpt_capacity=self.frontend.capacity)
        from .camera.base import camera_to_config
        self.camera_name = self.map_db.register_camera(
            self.camera_name, camera_to_config(self.cam), make_default=True,
        )
        self.mapper.db = self.map_db
        self.tracker.map_db = self.map_db
        self.tracker.state = TrackerState.NOT_INITIALIZED
        self.tracker.init_frame = None
        self.tracker.last_frame = None
        if self.global_optimizer is not None:
            go = self.global_optimizer
            go.db = self.map_db
            go.bow_db.map_db = self.map_db
            go.bow_db.inverted.clear()
            go.bow_db.kf_words.clear()
            go.bow_db.kf_bow.clear()
            go.loop_detector.db = self.map_db
            go.relocalizer.db = self.map_db
            go.last_loop_kf = -1
            with go._loop_qlock:
                go._loop_queue.clear()
        self.map_publisher = MapPublisher(self.map_db)
        self.trajectory.clear()
        self.traj_ref.clear()

    # ------------------------------------------------------------------
    def _use_fused(self) -> bool:
        """The fused TrackStep covers the common TRACKING path; every other
        state (init, Lost, reloc) takes the classic module ladder."""
        tr = self.tracker
        return (
            self._track_step is not None
            and tr.state == TrackerState.TRACKING
            and tr.last_frame is not None
            and tr.last_frame.pose_cw is not None
        )

    def feed_kind(self) -> str:
        """Sequence kind for this camera setup ('monocular'|'stereo'|'rgbd'),
        as accepted by feed_sequence."""
        if self.cam.setup == SetupType.STEREO:
            return "stereo"
        if self.cam.setup == SetupType.RGBD:
            return "rgbd"
        return "monocular"

    def feed_frame(self, *args, **kwargs):
        """Setup-dispatched per-frame feed: forwards to feed_monocular_frame
        / feed_stereo_frame / feed_RGBD_frame by the camera setup."""
        return {
            "monocular": self.feed_monocular_frame,
            "stereo": self.feed_stereo_frame,
            "rgbd": self.feed_RGBD_frame,
        }[self.feed_kind()](*args, **kwargs)

    def _pace_mapper(self):
        """Backpressure (async mapping): block the feed — with NO lock held
        — until the mapper's keyframe queue drains to <=1.  A mapper slower
        than the keyframe rate otherwise accumulates unprocessed keyframes
        whose unculled stereo seeds balloon the live landmark set and
        collapse tracking (800-kpt city circuit, lost at frame 58).  Pacing
        here, not inside keyframe insertion, matters: insertion runs with
        the map lock held, and the mapper needs that lock to drain."""
        # applies to every setup: stereo/RGBD backlogs balloon the local map
        # via instant depth seeds, and even mono backlogs delay culling /
        # triangulation enough to degrade quality and stretch the shutdown
        # drain (measured: mono bench ATE 0.010->0.051 and wall fps 19->7
        # with mono exempted from pacing)
        proxy = self._tracker_mapper
        wait = getattr(proxy, "wait_for_backlog", None)
        if wait is None or proxy.backlog < 2:
            return
        # bound any single feed-call wait to ~2x the median per-KF mapping
        # time (floor 0.5 s for cold-compile jitter): the feed must degrade
        # toward the mapper's real throughput, never park behind a stuck
        # stage — loop corrections run on their own worker now, and
        # wait_for_backlog early-outs while the mapper is paused
        times = proxy.kf_proc_times
        bound = max(0.5, 2.0 * float(np.median(times))) if times else 5.0
        t0 = time.perf_counter()
        wait(max_backlog=1, timeout=bound)
        dt = time.perf_counter() - t0
        self._pace_waits += 1
        self._pace_wait_s += dt
        self._pace_wait_max = max(self._pace_wait_max, dt)

    def feed_monocular_frame(self, image: np.ndarray, timestamp: float,
                             mask: Optional[np.ndarray] = None):
        """image: (rows, cols) uint8 grayscale or (rows, cols, 3) color.
        Returns pose_cw (4,4) or None."""
        self._pace_mapper()
        img = self._to_gray(image)
        mask = mask if mask is not None else self._static_mask
        mask_j = None if mask is None else jnp.asarray(mask, jnp.float32)
        import time as _time
        tr = self.tracker
        _t0 = _time.perf_counter()
        if self._use_fused():
            with self.map_lock:
                pose, frame = tr.track_fused(
                    img, self.frame_id, timestamp, self._track_step, mask_j)
            self.frame_id += 1
            self._fused_frames += 1
        else:
            kp = self.frontend.extract(jnp.asarray(img), mask_j)
            frame = Frame.from_keypoints(self.frame_id, timestamp, kp, self.cam)
            self.frame_id += 1
            with self.map_lock:
                pose = tr.track(frame)
        self.track_times.append(_time.perf_counter() - _t0)
        self._publish(frame, pose, image=img)
        self._append_trajectory(timestamp, pose)
        return pose

    def feed_stereo_frame(self, left: np.ndarray, right: np.ndarray,
                          timestamp: float, mask: Optional[np.ndarray] = None):
        """Rectified stereo pair -> pose (ref system::feed_stereo_frame).
        Runs the frontend on both images and row-matches descriptors to get
        per-keypoint disparity/depth."""
        from .ops.stereo import stereo_match_dense

        self._pace_mapper()
        l_img = self._to_gray(left)
        r_img = self._to_gray(right)
        mask = mask if mask is not None else self._static_mask
        mask_j = None if mask is None else jnp.asarray(mask, jnp.float32)
        import time as _time
        tr = self.tracker
        _t0 = _time.perf_counter()
        if self._use_fused():
            with self.map_lock:
                pose, frame = tr.track_fused(
                    l_img, self.frame_id, timestamp, self._track_step,
                    mask_j, aux=jnp.asarray(r_img))
            self.frame_id += 1
            self._fused_frames += 1
        else:
            kp_l = self.frontend.extract(jnp.asarray(l_img), mask_j)
            xr, depth = stereo_match_dense(
                jnp.asarray(l_img), jnp.asarray(r_img),
                kp_l.xy, kp_l.valid,
                jnp.float32(self.cam.focal_x_baseline),
            )
            frame = Frame.from_keypoints(
                self.frame_id, timestamp, kp_l, self.cam,
                x_right=np.asarray(xr), depth=np.asarray(depth),
            )
            self.frame_id += 1
            with self.map_lock:
                pose = tr.track(frame)
        self.track_times.append(_time.perf_counter() - _t0)
        self._publish(frame, pose, image=l_img)
        self._append_trajectory(timestamp, pose)
        return pose

    def feed_RGBD_frame(self, rgb: np.ndarray, depthmap: np.ndarray,
                        timestamp: float, mask: Optional[np.ndarray] = None):
        """RGB + registered depth map -> pose (ref system::feed_RGBD_frame).
        Depth sampled at keypoint locations; virtual right-u from depth."""
        self._pace_mapper()
        img = self._to_gray(rgb)
        mask = mask if mask is not None else self._static_mask
        mask_j = None if mask is None else jnp.asarray(mask, jnp.float32)
        z_map = (depthmap.astype(np.float32)
                 / max(self.cfg.depthmap_factor, 1e-9))
        import time as _time
        tr = self.tracker
        _t0 = _time.perf_counter()
        if self._use_fused():
            with self.map_lock:
                pose, frame = tr.track_fused(
                    img, self.frame_id, timestamp, self._track_step,
                    mask_j, aux=jnp.asarray(z_map))
            self.frame_id += 1
            self._fused_frames += 1
        else:
            kp = self.frontend.extract(jnp.asarray(img), mask_j)
            xy = np.asarray(kp.xy)
            u = np.clip(np.round(xy[:, 0]).astype(int), 0, self.cam.cols - 1)
            v = np.clip(np.round(xy[:, 1]).astype(int), 0, self.cam.rows - 1)
            z = z_map[v, u]
            valid_z = (z > 1e-3) & np.isfinite(z)
            depth = np.where(valid_z, z, -1.0).astype(np.float32)
            fxb = self.cam.focal_x_baseline
            x_right = np.where(
                valid_z, xy[:, 0] - fxb / np.maximum(z, 1e-6), -1.0
            ).astype(np.float32)
            frame = Frame.from_keypoints(
                self.frame_id, timestamp, kp, self.cam,
                x_right=x_right, depth=depth,
            )
            self.frame_id += 1
            with self.map_lock:
                pose = tr.track(frame)
        self.track_times.append(_time.perf_counter() - _t0)
        self._publish(frame, pose, image=img)
        self._append_trajectory(timestamp, pose)
        return pose

    # ------------------------------------------------------------------
    # pipelined sequence feed: overlap host bookkeeping with device compute
    # ------------------------------------------------------------------
    def feed_sequence(self, items, kind: str = "monocular", depth: int = 1):
        """Software-pipelined sequence feed.  ``items`` yields per-frame
        tuples — monocular ``(image, ts[, mask])``, stereo
        ``(left, right, ts[, mask])``, RGBD ``(rgb, depth, ts[, mask])`` —
        and this generator yields ``(timestamp, pose_cw or None)`` in order.

        The per-call ``feed_*_frame`` API must finish frame N before it can
        see frame N+1, so every frame pays a full dispatch->compute->fetch
        round trip.  With the whole sequence visible, up to ``depth`` fused
        device steps stay in flight: frame N+depth is dispatched BEFORE
        frame N's result is fetched, so frame N's host bookkeeping and map
        updates overlap the device compute (and, on remote-TPU links, the
        transfer RTT) of the frames behind it.  A dispatched step sees the
        map as of ``depth`` frames ago — the same stale-map semantics the
        reference already grants by running mapping in its own thread
        (SURVEY.md §2.3) — and its motion prediction applies the
        (depth+1)-frame displacement once (see _predict_pose for why the
        velocity must not be extrapolated repeatedly).  depth=1 suffices
        when the TPU is local; raise it to ~ceil(link_RTT / frame_work) on
        tunnel deployments.  Any frame that leaves the common TRACKING path
        (init, Lost, fused-step fallback) drains the pipeline and goes
        through the classic per-frame ladder unchanged.

        ``track_times`` records the yield-to-yield period per frame (the
        throughput-true figure under pipelining; per-phase wall times are
        in ``pipe_stats``), so ``stats()['fps']`` stays meaningful.
        """
        return self._feed_sequence_timed(items, kind, depth)

    def _feed_sequence_timed(self, items, kind, depth):
        import time as _time
        inner = self._feed_sequence_impl(items, kind, depth)
        t_last = _time.perf_counter()
        for out in inner:
            now = _time.perf_counter()
            # the classic fallback path appends its own per-frame time;
            # fused finishes don't — fill in the yield-to-yield period
            if len(self.track_times) < len(self.trajectory):
                self.track_times.append(now - t_last)
            t_last = now
            yield out

    def _feed_sequence_impl(self, items, kind: str, depth: int):
        import collections as _collections
        import time as _time
        kind = kind.lower()
        if kind not in ("monocular", "stereo", "rgbd"):
            raise ValueError(f"unknown sequence kind: {kind}")
        depth = max(1, min(int(depth), 31))   # pose-history bound, see tracker
        tr = self.tracker
        inflight = _collections.deque()   # dispatched-not-finished frames
        # per-phase wall times for latency attribution (tools/tpu_* probes)
        self.pipe_stats = {"prep_s": [], "dispatch_s": [], "finish_s": []}

        def _prepare(item):
            """-> (gray_img, ts, mask_j, aux, orig_item)"""
            if kind == "monocular":
                image, ts = item[0], item[1]
                mask = item[2] if len(item) > 2 else None
                img = self._to_gray(image)
                aux = None
            elif kind == "stereo":
                left, right, ts = item[0], item[1], item[2]
                mask = item[3] if len(item) > 3 else None
                img = self._to_gray(left)
                aux = jnp.asarray(self._to_gray(right))
            else:
                rgb, depthmap, ts = item[0], item[1], item[2]
                mask = item[3] if len(item) > 3 else None
                img = self._to_gray(rgb)
                aux = jnp.asarray(depthmap.astype(np.float32)
                                  / max(self.cfg.depthmap_factor, 1e-9))
            mask = mask if mask is not None else self._static_mask
            mask_j = None if mask is None else jnp.asarray(mask, jnp.float32)
            return img, ts, mask_j, aux, item

        def _feed_classic(item):
            if kind == "monocular":
                return self.feed_monocular_frame(*item)
            if kind == "stereo":
                return self.feed_stereo_frame(*item)
            return self.feed_RGBD_frame(*item)

        def _finish(flight):
            _t0 = _time.perf_counter()
            with self.map_lock:
                pose, frame = tr.track_fused_finish(flight["h"])
            self._fused_frames += 1
            self.pipe_stats["finish_s"].append(_time.perf_counter() - _t0)
            self._publish(frame, pose, image=flight["img"])
            self._append_trajectory(flight["ts"], pose)
            return pose

        def _tracking_ok():
            return (tr.state == TrackerState.TRACKING
                    and tr.last_frame is not None
                    and tr.last_frame.pose_cw is not None)

        def _discard_and_replay():
            """Tracking left the common path mid-flight: every younger
            in-flight step used a broken prediction — discard their device
            results and replay those frames through the classic ladder."""
            replay = list(inflight)
            inflight.clear()
            for fl in replay:
                self.frame_id = fl["fid"]       # reuse the consumed ids
                pose = _feed_classic(fl["item"])
                yield fl["ts"], pose

        for item in items:
            self._pace_mapper()    # backpressure before any lock is taken
            _tp = _time.perf_counter()
            img, ts, mask_j, aux, orig = _prepare(item)
            self.pipe_stats["prep_s"].append(_time.perf_counter() - _tp)
            if self._use_fused():
                _td = _time.perf_counter()
                with self.map_lock:
                    h = tr.track_fused_dispatch(
                        img, self.frame_id, ts, self._track_step,
                        mask_j, aux)
                self.pipe_stats["dispatch_s"].append(
                    _time.perf_counter() - _td)
                inflight.append({"h": h, "img": img, "ts": ts,
                                 "fid": self.frame_id, "item": orig})
                self.frame_id += 1
                while len(inflight) > depth:
                    fl = inflight.popleft()
                    pose = _finish(fl)
                    yield fl["ts"], pose
                    if not _tracking_ok():
                        yield from _discard_and_replay()
                        break
            else:
                # leave the common path: drain the pipeline, then feed this
                # frame through the classic ladder
                while inflight:
                    fl = inflight.popleft()
                    pose = _finish(fl)
                    yield fl["ts"], pose
                    if not _tracking_ok():
                        yield from _discard_and_replay()
                        break
                pose = _feed_classic(orig)
                yield ts, pose
        while inflight:
            fl = inflight.popleft()
            pose = _finish(fl)
            yield fl["ts"], pose
            if not _tracking_ok():
                yield from _discard_and_replay()
                break

    def enable_autosave(self, path: str, every_n_keyframes: int = 25):
        """Periodic async map snapshots (SURVEY.md §5.4 elastic recovery):
        every N new keyframes the map is serialized to `path` from a
        background thread (atomic rename), so a crashed session resumes via
        load_map_database + localization/relocalization."""
        self._autosave = (path, max(1, int(every_n_keyframes)))
        self._autosave_kfs = 0
        self._autosave_thread = None

    def disable_autosave(self):
        self._autosave = None

    def _maybe_autosave(self):
        if self._autosave is None:
            return
        path, every = self._autosave
        if self.map_db.n_kfs - self._autosave_kfs < every:
            return
        t = getattr(self, "_autosave_thread", None)
        if t is not None and t.is_alive():
            return          # previous snapshot still writing; skip this tick
        self._autosave_kfs = self.map_db.n_kfs

        def _write():
            from .io.map_database_io import save_map
            tmp = path + ".tmp"
            with self.map_lock:
                save_map(self.map_db, self.cfg, tmp)
            import os
            os.replace(tmp, path)

        self._autosave_thread = threading.Thread(
            target=_write, daemon=True, name="map-autosave")
        self._autosave_thread.start()

    def _append_trajectory(self, ts: float, pose):
        """Record the frame pose plus its reference-KF-relative anchor."""
        self.trajectory.append((ts, None if pose is None else pose.copy()))
        if pose is None:
            self.traj_ref.append(None)
            return
        db = self.map_db
        ref = self.tracker.ref_kf
        with self.map_lock:
            if 0 <= ref < db.n_kfs and db.kf_valid[ref]:
                rel = (pose @ np.linalg.inv(db.kf_pose_cw[ref])).astype(
                    np.float32)
                self.traj_ref.append((int(ref), rel))
            else:
                self.traj_ref.append(None)

    def _publish(self, frame, pose, image=None):
        self.frame_publisher.publish(frame, self.tracker.state.name, image=image)
        self._maybe_autosave()
        if pose is not None:
            self.map_publisher.set_current_pose(pose)

    def _to_gray(self, image: np.ndarray) -> np.ndarray:
        if image.ndim == 3:
            # reference default color order RGB; Rec.601 luma
            image = (
                0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2]
            ).astype(np.uint8)
        if self.cfg.raw.get("Preprocessing", {}).get("equalize_histogram", False):
            image = equalize_histogram(image)
        return image

    # ------------------------------------------------------------------
    def composed_poses(self):
        """(timestamps, poses_cw, tracked_mask) with each frame's pose
        COMPOSED from its save-time reference keyframe: pose = T_rel @
        T_refkf_cw_NOW (ref trajectory_io::save_frame_trajectory).  Loop
        corrections, pose-graph and global-BA rewrites that moved keyframes
        after a frame was tracked propagate to that frame retroactively —
        the raw live-tracking trajectory (tracked_poses) keeps pre-loop
        drift baked in for every frame fed before the closure.  Culled
        reference keyframes compose through their cull-time spanning-tree
        parent chain (data.MapDatabase.culled_rel)."""
        db = self.map_db
        ts = np.array([t for t, _ in self.trajectory])
        mask = np.array([p is not None for _, p in self.trajectory])
        poses = np.zeros((len(self.trajectory), 4, 4), np.float32)
        with self.map_lock:
            for i, (_, p) in enumerate(self.trajectory):
                if p is None:
                    poses[i] = np.eye(4, dtype=np.float32)
                    continue
                ref = self.traj_ref[i] if i < len(self.traj_ref) else None
                if ref is None:
                    poses[i] = p
                    continue
                kf, rel = ref
                hops = 0
                while (0 <= kf < db.n_kfs and not db.kf_valid[kf]
                       and kf in db.culled_rel and hops < 256):
                    parent, prel = db.culled_rel[kf]
                    rel = rel @ prel
                    kf = parent
                    hops += 1
                if 0 <= kf < db.n_kfs and db.kf_valid[kf]:
                    poses[i] = rel @ db.kf_pose_cw[kf]
                else:
                    poses[i] = p
        return ts, poses, mask

    def save_frame_trajectory(self, path: str, fmt: str = "TUM",
                              composed: bool = True):
        """Write the frame trajectory (TUM or KITTI format).  composed=True
        (the reference behavior) recomposes each pose from its reference
        keyframe's current pose so post-hoc corrections are included;
        composed=False writes the raw live-tracking poses."""
        if composed:
            ts_a, poses_a, mask = self.composed_poses()
            ts = list(ts_a[mask])
            poses = poses_a[mask]
        else:
            ts = [t for t, p in self.trajectory if p is not None]
            poses = np.stack([p for _, p in self.trajectory if p is not None]) \
                if any(p is not None for _, p in self.trajectory) else np.zeros((0, 4, 4))
        if fmt.upper() == "TUM":
            trajectory_io.save_trajectory_tum(path, ts, poses)
        else:
            trajectory_io.save_trajectory_kitti(path, poses)

    def save_keyframe_trajectory(self, path: str, fmt: str = "TUM"):
        ids = self.map_db.valid_kf_ids()
        ts = self.map_db.kf_timestamp[ids]
        poses = self.map_db.kf_pose_cw[ids]
        if fmt.upper() == "TUM":
            trajectory_io.save_trajectory_tum(path, ts, poses)
        else:
            trajectory_io.save_trajectory_kitti(path, poses)

    def stats(self) -> dict:
        """Observability counters (ref publish metrics: tracked landmarks,
        KF count, frames/s; SURVEY.md §5.5).  Takes the map lock: counters
        are read while the async mapping worker may be mutating (and
        growing) the map arrays."""
        with self.map_lock:
            return self._stats_locked()

    def _stats_locked(self) -> dict:
        tt = np.array(self.track_times) if self.track_times else np.zeros(1)
        proxy = self._tracker_mapper
        return {
            "state": self.tracker.state.name,
            "frames_fed": self.frame_id,
            "frames_tracked": sum(p is not None for _, p in self.trajectory),
            "num_keyframes": int(len(self.map_db.valid_kf_ids())),
            "num_landmarks": int(len(self.map_db.valid_lm_ids())),
            "num_tracked_landmarks": self.tracker.num_tracked,
            "loops_closed": (
                self.global_optimizer.num_loops_closed
                if self.global_optimizer is not None else 0
            ),
            "median_track_ms": float(np.median(tt) * 1000),
            "fps": float(1.0 / max(np.median(tt), 1e-9)),
            "fused_frames": self._fused_frames,
            "local_ba_runs": self.mapper.ba_runs,
            # unlocked mapping results discarded because a whole-map
            # geometry rewrite landed mid-flight (versioned application)
            "stale_discards": self.mapper.stale_discards,
            "pred_hist_misses": self.tracker.pred_hist_misses,
            # feed-path backpressure accounting (VERDICT r4 #7: stalls must
            # be observable in every artifact)
            "pace_waits": self._pace_waits,
            "pace_wait_s": round(self._pace_wait_s, 4),
            "pace_wait_max_s": round(self._pace_wait_max, 4),
            "pace_timeouts": getattr(proxy, "timeouts_hit", 0),
            # loop-worker state (0/absent in sync mode)
            "loop_backlog": (
                self.global_optimizer.loop_backlog
                if self.global_optimizer is not None else 0),
            "loop_stale_discards": (
                self.global_optimizer.loop_stale_discards
                if self.global_optimizer is not None else 0),
            "loop_checks_run": (
                self.global_optimizer.loop_checks_run
                if self.global_optimizer is not None else 0),
            "loop_cands_seen": (
                self.global_optimizer.loop_cands_seen
                if self.global_optimizer is not None else 0),
            "loop_validations": (
                self.global_optimizer.loop_validations
                if self.global_optimizer is not None else 0),
            "ba_iters_per_s": (
                self.mapper.ba_iters_total / self.mapper.ba_wall_s
                if self.mapper.ba_wall_s > 0 else 0.0),
            # capacity-overflow accounting: entries silently dropped at any
            # fixed-capacity boundary (local map cap, BA windows) — nonzero
            # values mean the caps need raising for this sequence
            "overflow": {**self.tracker.overflow, **self.mapper.overflow},
        }

    def tracked_poses(self):
        """(timestamps, poses_cw, tracked_mask) over all fed frames."""
        ts = np.array([t for t, _ in self.trajectory])
        mask = np.array([p is not None for _, p in self.trajectory])
        poses = np.stack(
            [p if p is not None else np.eye(4, dtype=np.float32) for _, p in self.trajectory]
        ) if len(self.trajectory) else np.zeros((0, 4, 4), np.float32)
        return ts, poses, mask

    def save_map_database(self, path: str, format: str = "native"):
        """Snapshot the map.  format: "native" (columnar openvslam_tpu/1)
        or "openvslam" (the reference's msgpack schema — interoperable with
        maps the reference reads/writes)."""
        _log.info("saving map database to %s (%s format)", path, format)
        if format == "openvslam":
            from .io.msgpack_compat import save_map_openvslam
            save_map_openvslam(self.map_db, self.cfg, path)
        else:
            from .io.map_database_io import save_map
            save_map(self.map_db, self.cfg, path)

    def load_map_database(self, path: str):
        """Load a snapshot; the on-disk schema (native columnar vs the
        reference's msgpack layout) is sniffed from the unpacked blob (the
        file is read and deserialized exactly once)."""
        import msgpack
        from .io.msgpack_compat import sniff_blob, load_map_openvslam
        with open(path, "rb") as f:
            blob = msgpack.unpackb(f.read(), raw=False)
        _log.info("loading map database from %s (%s schema)", path,
                  "openvslam msgpack" if sniff_blob(blob) else "native columnar")
        if sniff_blob(blob):
            load_map_openvslam(self.map_db, path, blob=blob)
        else:
            from .io.map_database_io import load_map
            load_map(self.map_db, path, blob=blob)
        if self.global_optimizer is not None:
            # rebuild the BoW inverted index for relocalization/loop queries
            bow = self.global_optimizer.bow_db
            for kf in self.map_db.valid_kf_ids():
                kf = int(kf)
                words = bow.compute_words(
                    self.map_db.kf_desc_i8[kf], self.map_db.kf_kpt_valid[kf]
                )
                bow.add_keyframe(kf, words)


class _AsyncMapperProxy:
    """Mapping pipeline off the tracking thread (ref: mapping runs in its own
    std::thread consuming a keyframe queue; SURVEY.md §2.3 contract —
    tracking never blocks on BA, BA skipped when a backlog builds up)."""

    def __init__(self, mapper, map_lock):
        self.mapper = mapper
        self.map_lock = map_lock
        self.pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self.queue = collections.deque()
        self._qlock = threading.Lock()
        self._future = None
        self._resume_evt = threading.Event()
        self._resume_evt.set()
        # drain-progress event: set after every processed keyframe so
        # wait_for_backlog can wait on progress instead of sleep-polling
        self._progress_evt = threading.Event()
        # per-keyframe processing wall times (bounds the feed-path pace
        # timeout at ~2x the median; see System._pace_mapper)
        self.kf_proc_times = collections.deque(maxlen=32)
        self.timeouts_hit = 0

    def pause(self, wait: bool = False):
        """Request pause; with wait=True block until the in-flight keyframe
        (if any) finishes — used by the loop worker before a correction
        (ref: loop correction pauses mapping and waits).  Must be called
        WITHOUT the map lock held: the in-flight keyframe needs the lock
        to finish."""
        self._resume_evt.clear()
        if wait:
            with self._qlock:
                fut = self._future
            if fut is not None:
                fut.result()

    def resume(self):
        self._resume_evt.set()
        with self._qlock:
            if self.queue and (self._future is None or self._future.done()):
                try:
                    self._future = self.pool.submit(self._drain)
                except RuntimeError:
                    pass        # pool already shut down (System.shutdown)

    @property
    def paused(self) -> bool:
        return not self._resume_evt.is_set()

    # passthroughs used by the tracker
    def after_initialization(self, kf1, kf2):
        return self.mapper.after_initialization(kf1, kf2)

    def after_stereo_initialization(self, kf):
        return self.mapper.after_stereo_initialization(kf)

    @property
    def idle(self) -> bool:
        with self._qlock:
            return not self.queue and (self._future is None or self._future.done())

    @property
    def backlog(self) -> int:
        """Keyframes queued behind the one being processed (the tracker's
        keyframe-insertion gate reads this; ref keyframe_inserter checks
        the mapping module's queue before allowing a new keyframe)."""
        with self._qlock:
            return len(self.queue)

    def wait_for_backlog(self, max_backlog: int = 1, timeout: float = 30.0):
        """Block the tracking thread until the queue drains to
        `max_backlog`.  Backpressure: keyframe insertion is paced to the
        mapper's real throughput, so a saturated mapper degrades toward
        synchronous mapping instead of accumulating unculled stereo seeds
        (which balloon the local map and collapse the inlier count —
        observed on the 800-kpt city circuit where per-KF mapping cost
        exceeds the KF interval on a remote-tunnel device).

        Returns True if the backlog drained, False on early-out.  Early-outs
        (no point waiting): the mapper is PAUSED (a loop correction is in
        flight, or a viewer called pause_other_threads — the queue cannot
        shrink, so waiting would burn the full timeout per fed frame), or
        the timeout expires (logged: silent 30 s/frame stalls were
        undiagnosable in the r4 city artifacts)."""
        deadline = time.time() + timeout
        while True:
            if self.backlog <= max_backlog:
                return True
            if not self._resume_evt.is_set():
                return False          # paused: the queue cannot drain
            remaining = deadline - time.time()
            if remaining <= 0:
                self.timeouts_hit += 1
                _log.warning(
                    "wait_for_backlog timed out after %.1fs "
                    "(backlog %d > %d); feeding anyway",
                    timeout, self.backlog, max_backlog)
                return False
            # wait on drain progress, not a fixed-rate poll
            self._progress_evt.clear()
            self._progress_evt.wait(min(remaining, 0.25))

    def insert_keyframe(self, frame) -> int:
        # store synchronously (caller already holds the map lock)
        kf = self.mapper.store_keyframe(frame)
        with self._qlock:
            self.queue.append(kf)
            if self._future is None or self._future.done():
                self._future = self.pool.submit(self._drain)
        return kf

    def _drain(self):
        while True:
            if not self._resume_evt.is_set():
                return          # paused: resume() resubmits the drain
            with self._qlock:
                if not self.queue:
                    return
                kf = self.queue.popleft()
                backlog = len(self.queue) > 0
            # BA aborted (skipped) when newer keyframes are waiting
            t0 = time.perf_counter()
            self.mapper.process_keyframe(kf, run_ba=not backlog)
            self.kf_proc_times.append(time.perf_counter() - t0)
            self._progress_evt.set()

    def drain(self):
        """Process everything still queued, then stop the worker.  The loop
        worker may briefly hold this proxy paused mid-shutdown (a correction
        in flight) — wait for the resume instead of abandoning the queue."""
        deadline = time.time() + 300
        while time.time() < deadline:
            with self._qlock:
                fut = self._future
            if fut is not None:
                fut.result()
            with self._qlock:
                pending = bool(self.queue)
            if not pending:
                break
            if self._resume_evt.wait(timeout=5.0):
                self.resume()       # resubmit the drain future
        self.pool.shutdown(wait=True)
