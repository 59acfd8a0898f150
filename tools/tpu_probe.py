"""Consolidated TPU measurement probe (replaces the historical
``tpu_measure*.py`` one-offs; their findings live in docs/kernels.md).

Everything runs in ONE process — the axon tunnel is single-tenant, so batch
measurements instead of launching several probes.

Subcommands:
  framestep   steady-state fused FrameStep timing (the kernel headline)
  system      full System smoke: mono synthetic sequence via the public API,
              per-frame and pipelined feeds; prints tracked ratio / ATE / fps
  pipeline    pipelined-feed depth sweep (tunnel-RTT hiding)
  city        full System over the cached city-course sequence (stereo,
              mapping + loop closure ON) — the system-level number

Run:  python tools/tpu_probe.py <subcommand> [options]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


# ----------------------------------------------------------------------
def cmd_framestep(args):
    """Steady-state fused FrameStep throughput (bench.py's configuration)."""
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frame_step import FrameStep
    from openvslam_tpu.utils import synthetic

    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    fs = FrameStep(cam, max_keypts=args.keypts, num_levels=args.levels,
                   lm_capacity=4096)
    rng = np.random.default_rng(5)
    scene = synthetic.PatchSceneRenderer(rng, n_points=900, rows=480, cols=640)
    n = 40
    poses = synthetic.orbit_trajectory(n, radius=2.5, arc=np.pi / 4)
    imgs = [jax.device_put(jnp.asarray(scene.render(cam, poses[i])))
            for i in range(n)]
    pose_d = [jax.device_put(jnp.asarray(p.astype(np.float32)))
              for p in poses]
    L = fs.lm_capacity
    lm_pos = jnp.zeros((L, 3), jnp.float32)
    lm_desc = jnp.zeros((L, 256), jnp.int8)
    lm_valid = jnp.zeros(L, bool)
    lm_lvl = jnp.full(L, -1, jnp.int32)
    out = fs.step(imgs[0], pose_d[0], lm_pos, lm_desc, lm_valid, lm_lvl)
    jax.block_until_ready(out)
    for i in range(n):
        out = fs.step(imgs[i], pose_d[i], lm_pos, lm_desc, lm_valid, lm_lvl)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    total = 0
    for _ in range(args.reps):
        for i in range(n):
            out = fs.step(imgs[i], pose_d[i], lm_pos, lm_desc,
                          lm_valid, lm_lvl)
            total += 1
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"framestep: {total} frames in {dt:.2f}s -> "
          f"{total/dt:.1f} fps/chip ({dt/total*1000:.3f} ms/frame) "
          f"on {jax.devices()[0]}")


# ----------------------------------------------------------------------
def _mono_cfg():
    from openvslam_tpu.config import Config
    return Config.from_dict({
        "Camera": {"name": "smoke", "setup": "monocular",
                   "model": "perspective",
                   "fx": 350.0, "fy": 350.0, "cx": 208.0, "cy": 160.0,
                   "cols": 416, "rows": 320, "fps": 20},
        "Feature": {"max_num_keypts": 600, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })


def _mono_scene(cfg, n):
    from openvslam_tpu.utils import synthetic
    cam = cfg.camera
    rng = np.random.default_rng(11)
    scene = synthetic.PatchSceneRenderer(rng, n_points=700, center=(0, 0, 6),
                                         extent=(6, 4.5, 2.5),
                                         rows=cam.rows, cols=cam.cols)
    gt = synthetic.orbit_trajectory(n, radius=2.5, target=(0, 0, 6),
                                    arc=np.pi / 4)
    imgs = [scene.render(cam, gt[i]) for i in range(n)]
    return imgs, gt


def _ate(est_pairs, gt):
    from openvslam_tpu.utils import evaluate
    idx = [i for i, p in enumerate(est_pairs) if p is not None]
    ce = np.stack([-est_pairs[i][:3, :3].T @ est_pairs[i][:3, 3]
                   for i in idx])
    cg = np.stack([-gt[i][:3, :3].T @ gt[i][:3, 3] for i in idx])
    return len(idx), evaluate.ate_rmse(ce, cg, align="sim3")


def cmd_system(args):
    """Full System smoke (mono, per-frame + pipelined feeds)."""
    import jax
    from openvslam_tpu.system import System
    print("backend:", jax.devices(), flush=True)
    cfg = _mono_cfg()
    n = args.frames
    imgs, gt = _mono_scene(cfg, n)
    s = System(cfg)
    s.startup()
    est, times = [], []
    for i in range(n):
        t0 = time.perf_counter()
        est.append(s.feed_monocular_frame(imgs[i], i / 20.0))
        times.append(time.perf_counter() - t0)
    s.shutdown()
    nt, ate = _ate(est, gt)
    tt = np.array(times[5:])
    print(f"per-frame: tracked {nt}/{n}; ATE(sim3) {ate:.4f} m; "
          f"median frame {np.median(tt)*1000:.1f} ms "
          f"({1.0/np.median(tt):.1f} fps)", flush=True)

    s2 = System(cfg)
    s2.startup()
    out, ytimes = [], []
    t_last = time.perf_counter()
    for _, pose in s2.feed_sequence(
            ((imgs[i], i / 20.0) for i in range(n)), kind="monocular",
            depth=args.depth):
        now = time.perf_counter()
        ytimes.append(now - t_last)
        t_last = now
        out.append(pose)
    s2.shutdown()
    nt2, ate2 = _ate(out, gt)
    yt = np.array(ytimes[5:])
    print(f"pipelined(depth={args.depth}): tracked {nt2}/{n}; "
          f"ATE(sim3) {ate2:.4f} m; median frame {np.median(yt)*1000:.1f} ms "
          f"({1.0/np.median(yt):.1f} fps, fused {s2._fused_frames})",
          flush=True)


def cmd_pipeline(args):
    """Depth sweep of the pipelined feed (tunnel-RTT hiding)."""
    from openvslam_tpu.system import System
    cfg = _mono_cfg()
    n = args.frames
    imgs, gt = _mono_scene(cfg, n)
    for depth in [1, 2, 3, 4, 6]:
        s = System(cfg)
        s.startup()
        ytimes = []
        t_last = time.perf_counter()
        out = []
        for _, pose in s.feed_sequence(
                ((imgs[i], i / 20.0) for i in range(n)), kind="monocular",
                depth=depth):
            now = time.perf_counter()
            ytimes.append(now - t_last)
            t_last = now
            out.append(pose)
        s.shutdown()
        nt, ate = _ate(out, gt)
        yt = np.array(ytimes[5:])
        print(f"depth {depth}: {np.median(yt)*1000:6.1f} ms/frame "
              f"({1.0/np.median(yt):6.1f} fps)  tracked {nt}/{n}  "
              f"ATE {ate:.4f} m", flush=True)


def cmd_city(args):
    """System-level run over the cached city sequence (see city_bench.py
    for rendering); this is the steady-state stereo SLAM number on TPU."""
    import subprocess
    cb = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "city_bench.py")
    sys.exit(subprocess.call(
        [sys.executable, cb, "--frames", str(args.frames)]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("framestep")
    p.add_argument("--keypts", type=int, default=1024)
    p.add_argument("--levels", type=int, default=8)
    p.add_argument("--reps", type=int, default=3)
    p.set_defaults(fn=cmd_framestep)
    p = sub.add_parser("system")
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--depth", type=int, default=3)
    p.set_defaults(fn=cmd_system)
    p = sub.add_parser("pipeline")
    p.add_argument("--frames", type=int, default=60)
    p.set_defaults(fn=cmd_pipeline)
    p = sub.add_parser("city")
    p.add_argument("--frames", type=int, default=400)
    p.set_defaults(fn=cmd_city)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
