"""Shared CLI plumbing for the example runners (ref ``example/run_*_slam.cc``
popl flags: --vocab, --setting, dataset dir, --mask, --frame-skip, --no-sleep,
--auto-term, --debug, --eval-log, --map-db in/out)."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("-v", "--vocab", default="default",
                   help="vocabulary file (.npz / ORBvoc.txt / .dbow2) or 'default' or 'none'")
    p.add_argument("-s", "--setting", required=True, help="config YAML")
    p.add_argument("--mask", default=None, help="mask image (png/pgm)")
    p.add_argument("--frame-skip", type=int, default=1)
    p.add_argument("--no-sleep", action="store_true")
    p.add_argument("--auto-term", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--eval-log", action="store_true",
                   help="dump frame_trajectory.txt + track_times.txt")
    p.add_argument("--map-db-in", default=None)
    p.add_argument("--map-db-out", default=None)
    p.add_argument("--map-format", default="native",
                   choices=["native", "openvslam"],
                   help="--map-db-out schema: fast columnar (native) or the "
                        "reference's msgpack layout (openvslam); loading "
                        "auto-detects either")
    p.add_argument("--traj-out", default="frame_trajectory.txt")
    p.add_argument("--traj-format", default="TUM", choices=["TUM", "KITTI"])
    p.add_argument("--viewer", action="store_true",
                   help="serve the live web viewer (ref socket_publisher)")
    p.add_argument("--viewer-port", type=int, default=7007)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace (TensorBoard) to DIR")
    p.add_argument("--auto-save", default=None, metavar="PATH",
                   help="periodic async map snapshots to PATH")
    p.add_argument("--sync-mapping", action="store_true",
                   help="run mapping inline with tracking (default: own "
                        "thread, the reference's 3-module concurrency)")
    p.add_argument("--pipeline", action="store_true",
                   help="software-pipelined feeding (frame N+1's device "
                        "step overlaps frame N's bookkeeping; recommended "
                        "when the TPU is reached over a per-call-RTT link)")
    p.add_argument("--pipeline-depth", type=int, default=1,
                   help="frames kept in flight with --pipeline; raise to "
                        "~ceil(link_RTT / frame_work) on remote-TPU links")
    return p


def build_system(args):
    import logging

    # persistent XLA compile cache: BA bucket shapes recur across runs, so
    # cache hits remove the per-bucket compile stalls on later sessions
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System

    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    cfg = Config.from_yaml(args.setting)
    vocab = None if args.vocab == "none" else args.vocab
    system = System(cfg, vocab_path=vocab,
                    async_mapping=not getattr(args, "sync_mapping", False))
    if getattr(args, "mask", None):
        # reference convention (run_*_slam --mask): nonzero pixels = extract
        from openvslam_tpu.utils.datasets import _imread_gray
        m = _imread_gray(args.mask)
        if m.shape != (cfg.camera.rows, cfg.camera.cols):
            raise SystemExit(
                f"mask shape {m.shape} != camera "
                f"({cfg.camera.rows}, {cfg.camera.cols})")
        m = (m > 0).astype(np.float32)
        if system._static_mask is not None:   # merge with mask_rectangles
            m = m * system._static_mask
        system._static_mask = m
    if args.map_db_in:
        system.load_map_database(args.map_db_in)
        system.disable_mapping_module()
    system.startup()
    if getattr(args, "viewer", False):
        from openvslam_tpu.publish import SocketViewer
        system._viewer = SocketViewer(system, port=args.viewer_port).start()
        print(f"live viewer at {system._viewer.url}")
    if getattr(args, "auto_save", None):
        system.enable_autosave(args.auto_save)
    if getattr(args, "profile", None):
        import jax
        jax.profiler.start_trace(args.profile)
        system._profiling = True
    return cfg, system


def frame_gate(system) -> bool:
    """Honor the live viewer's playback controls each frame (ref
    pangolin_viewer: the example loop checks pause/step/terminate).
    Returns False when the loop should stop feeding."""
    v = getattr(system, "_viewer", None)
    if v is None:
        return True
    return v.wait_if_paused()


def feed_loop(args, system, items, kind: str):
    """Feed a sequence of per-frame tuples (see System.feed_sequence for the
    shapes per kind).  Honors the viewer's playback gate each frame.  With
    --pipeline the software-pipelined System.feed_sequence is used; the
    classic per-frame API otherwise.  Returns per-frame wall times."""
    times = []
    if getattr(args, "pipeline", False):
        def gated():
            for it in items:
                if not frame_gate(system):
                    return
                yield it
        t_last = time.perf_counter()
        for _ts, _pose in system.feed_sequence(
                gated(), kind=kind,
                depth=getattr(args, "pipeline_depth", 1)):
            now = time.perf_counter()
            times.append(now - t_last)
            t_last = now
        return times
    feed = {"monocular": system.feed_monocular_frame,
            "stereo": system.feed_stereo_frame,
            "rgbd": system.feed_RGBD_frame}[kind]
    for it in items:
        if not frame_gate(system):
            break
        with Timer() as t:
            feed(*it)
        times.append(t.dt)
    return times


def finish(args, system, track_times):
    if getattr(system, "_profiling", False):
        import jax
        jax.profiler.stop_trace()
    if getattr(system, "_viewer", None) is not None:
        system._viewer.stop()
    system.shutdown()
    system.save_frame_trajectory(args.traj_out, args.traj_format)
    if args.eval_log:
        with open("track_times.txt", "w") as f:
            f.writelines(f"{t:.9f}\n" for t in track_times)
    if args.map_db_out:
        system.save_map_database(args.map_db_out, format=args.map_format)
    tt = np.array(track_times)
    if len(tt):
        print(f"median tracking time: {np.median(tt)*1000:.1f} ms "
              f"({1.0/np.median(tt):.1f} fps)")
        print(f"mean tracking time:   {tt.mean()*1000:.1f} ms")


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.dt = time.perf_counter() - self.t0
