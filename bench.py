"""Benchmark: frames/s/chip, kernel AND system level.

Two measurements (VERDICT r2 next-#5 - the headline must be a System
number, not a kernel number):

1. SYSTEM: the full System (synchronous mapping ON - keyframe insertion,
   triangulation, fusion, local BA; the complete SLAM loop) over a rendered
   monocular sequence at the reference's config-1 settings, steady-state,
   pipelined feed.  This is the headline "value".
2. KERNEL: the fused FrameStep (pyramid+FAST+rBRIEF extraction,
   projection-gated MXU Hamming matching vs a 4096-landmark local map,
   4x10 pose-only LM) steady-state on pre-staged device frames - the
   per-chip tracking ceiling, reported as "kernel_frames_per_s_per_chip".

Prints ONE JSON line:

  {"metric": "system_frames_per_s_per_chip", "value": ..., "unit": "frames/s",
   "vs_baseline": ..., "kernel_frames_per_s_per_chip": ..., ...}

Baseline: the reference's desktop-CPU tracking time is the 20-40 ms/frame
class (BASELINE.md), i.e. ~30 fps; vs_baseline = ours / 30.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compilation cache: a successful compile of the fused frame
# step survives process restarts (the axon remote-compile tunnel is flaky;
# cache hits avoid recompiling the large program every run)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np

BASELINE_FPS = 30.0


def system_bench():
    """Full System over a rendered mono orbit sequence at the REFERENCE's
    config-1 working point (SURVEY §6 / VERDICT r3 next-#7): 640x480, 1000
    keypoints, 8 pyramid levels, loop detector ON — apples-to-apples with
    the reference's 20-40 ms/frame desktop-CPU tracking times.  Mapping ON
    in its own worker (async — the reference's 3-thread concurrency
    contract: tracking never blocks on BA), pipelined feed at depth 3
    (hides the tunnel RTT; a colocated host needs depth 1).
    Returns (fps, ate_sim3_m, tracked_frac, n_keyframes)."""
    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic, evaluate

    cfg = Config.from_dict({
        "Camera": {"name": "bench-mono", "setup": "monocular",
                   "model": "perspective",
                   "fx": 520.0, "fy": 520.0, "cx": 320.0, "cy": 240.0,
                   "cols": 640, "rows": 480, "fps": 20},
        "Feature": {"max_num_keypts": 1000, "num_levels": 8,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": True, "min_continuity": 3},
    })
    cam = cfg.camera
    rng = np.random.default_rng(11)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=900, center=(0, 0, 6), extent=(7, 5, 2.5),
        rows=cam.rows, cols=cam.cols)
    n = int(os.environ.get("OPENVSLAM_TPU_BENCH_FRAMES", "240"))
    gt = synthetic.orbit_trajectory(n, radius=2.5, target=(0, 0, 6),
                                    arc=np.pi / 3)
    imgs = [scene.render(cam, gt[i]) for i in range(n)]

    warm = 40                       # warmup prefix excluded from the rate
    s = System(cfg, async_mapping=True)
    s.startup()
    out = []
    t_warm = [None]

    def items():
        for i in range(n):
            if i == warm:
                # reset the link-wait accumulators at the measurement start
                # so the decomposition below matches the timed window
                s.tracker.fetch_wait_s = 0.0
                s._pace_waits = 0
                s._pace_wait_s = 0.0
                t_warm[0] = time.perf_counter()
            yield imgs[i], i / 20.0

    for _, pose in s.feed_sequence(items(), kind="monocular", depth=3):
        out.append(pose)
    t_end = time.perf_counter()
    fetch_wait = s.tracker.fetch_wait_s
    pace_wait = s._pace_wait_s
    s.shutdown()
    idx = [i for i, p in enumerate(out) if p is not None]
    ce = np.stack([-out[i][:3, :3].T @ out[i][:3, 3] for i in idx])
    cg = np.stack([-gt[i][:3, :3].T @ gt[i][:3, 3] for i in idx])
    ate = float(evaluate.ate_rmse(ce, cg, align="sim3"))
    # Two rates:
    # - median per-frame tracking time (the reference's track_times metric:
    #   its 20-40 ms/frame is the TRACKING thread only, mapping runs on
    #   another core) -> the apples-to-apples headline
    # - wall-clock rate including serialized mapping (KF-insertion spikes)
    tt = np.array(s.track_times[warm:])
    fps_median = 1.0 / max(float(np.median(tt)), 1e-9)
    wall_s = max(t_end - t_warm[0], 1e-9)
    fps_wall = (n - warm) / wall_s
    # Wall-time decomposition (VERDICT r4 #5: make "the wall rate is the
    # tunnel, not the system" a measured claim).  The feed thread's blocked
    # time splits into (a) fused-step result-fetch waits — device compute
    # plus the remote link's RTT residual — and (b) backpressure pace waits
    # behind the (RTT-bound) mapper.  Everything else is host work.
    decomp = {
        "wall_s": round(wall_s, 2),
        "fetch_wait_s": round(fetch_wait, 2),
        "pace_wait_s": round(pace_wait, 2),
        "host_other_s": round(max(wall_s - fetch_wait - pace_wait, 0.0), 2),
    }
    return (fps_median, fps_wall, ate, len(idx) / n,
            len(s.map_db.valid_kf_ids()), decomp, n - warm)


def kernel_bench():
    import jax
    import jax.numpy as jnp

    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frame_step import FrameStep
    from openvslam_tpu.utils import synthetic

    cam = Perspective.create(
        fx=520.0, fy=520.0, cx=320.0, cy=240.0, cols=640, rows=480, fps=30.0,
    )
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)

    rng = np.random.default_rng(5)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=900, center=(0, 0, 6), extent=(7, 5, 2.5), rows=480, cols=640
    )
    n_frames = 40
    poses = synthetic.orbit_trajectory(n_frames, radius=2.5, target=(0, 0, 6), arc=np.pi / 4)
    images = [scene.render(cam, poses[i]) for i in range(n_frames)]

    # local map: scene points with descriptors sampled from frame-0 extraction
    kp0 = fs.frontend.extract(jnp.asarray(images[0]))
    kp_xy = np.asarray(kp0.xy)
    kp_valid = np.asarray(kp0.valid)
    kp_desc = np.asarray(kp0.desc_i8)
    pc0 = (poses[0][:3, :3] @ scene.points.T).T + poses[0][:3, 3]
    uv0, _, vis0 = cam.project(jnp.asarray(pc0, jnp.float32))
    uv0 = np.asarray(uv0)
    vis0 = np.asarray(vis0)

    L = fs.lm_capacity
    lm_pos = np.zeros((L, 3), np.float32)
    lm_desc = np.zeros((L, 256), np.int8)
    lm_valid = np.zeros(L, bool)
    n = 0
    for i in np.where(vis0)[0]:
        d = np.linalg.norm(kp_xy - uv0[i], axis=-1)
        d[~kp_valid] = 1e9
        j = int(np.argmin(d))
        if d[j] < 3.0 and n < L:
            lm_pos[n] = scene.points[i]
            lm_desc[n] = kp_desc[j]
            lm_valid[n] = True
            n += 1
    lm_lvl = np.full(L, -1, np.int32)

    lm_pos_j = jnp.asarray(lm_pos)
    lm_desc_j = jnp.asarray(lm_desc)
    lm_valid_j = jnp.asarray(lm_valid)
    lm_lvl_j = jnp.asarray(lm_lvl)

    # stage the frames on device up front: a colocated deployment DMAs the
    # camera frame for ~free, but pushing 300 KB/frame through the axon
    # remote tunnel inside the timed loop would measure the tunnel (24 ms
    # RTT), not the chip
    imgs_dev = [jax.device_put(jnp.asarray(im)) for im in images]
    poses_dev = [jax.device_put(jnp.asarray(p.astype(np.float32))) for p in poses]
    jax.block_until_ready((imgs_dev, poses_dev))

    # warmup: compile, then one full pass so the runtime reaches steady
    # state (allocator/dispatch warmup costs ~0.5 ms/frame for the first
    # ~40 dispatches on the tunnel-attached v5e — measured in
    # tools/tpu_probe.py framestep: first 40-rep block 621 fps, steady 881)
    out = fs.step(imgs_dev[0], poses_dev[0],
                  lm_pos_j, lm_desc_j, lm_valid_j, lm_lvl_j)
    jax.block_until_ready(out)
    inl0 = int(out.num_inliers)
    for i in range(n_frames):
        out = fs.step(imgs_dev[i], poses_dev[i],
                      lm_pos_j, lm_desc_j, lm_valid_j, lm_lvl_j)
    jax.block_until_ready(out)

    # timed loop (steady-state throughput)
    reps = 3
    t0 = time.perf_counter()
    total = 0
    for _ in range(reps):
        for i in range(n_frames):
            out = fs.step(imgs_dev[i], poses_dev[i],
                          lm_pos_j, lm_desc_j, lm_valid_j, lm_lvl_j)
            total += 1
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = total / dt

    print(
        f"[bench] kernel: {total} frames in {dt:.2f}s on {jax.devices()[0]}, "
        f"frame-0 inliers={inl0}, landmarks={n}", file=sys.stderr,
    )
    return fps


def main():
    kernel_fps = kernel_bench()
    (sys_fps, fps_wall, sys_ate, tracked, n_kfs, decomp,
     n_meas) = system_bench()
    # colocated-host estimate: the link waits (fetch + pace) are replaced
    # by the MEASURED on-chip step cost (kernel_fps is the steady-state
    # device rate for the same frame program), host work kept as measured.
    # On a colocated deployment there is no tunnel RTT to hide, so this is
    # the wall rate the same code would deliver there (estimate, labeled).
    coloc_s = decomp["host_other_s"] + n_meas / max(kernel_fps, 1e-9)
    fps_wall_excl_rtt = n_meas / max(coloc_s, 1e-9)
    print(
        f"[bench] system: {sys_fps:.1f} fps median tracking rate "
        f"({fps_wall:.1f} fps wall incl. serialized mapping; "
        f"{fps_wall_excl_rtt:.1f} fps colocated-host estimate), "
        f"ATE(sim3) {sys_ate:.4f} m, tracked {tracked:.2f}, {n_kfs} KFs; "
        f"wall decomp {decomp}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "system_frames_per_s_per_chip",
        "value": round(sys_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(sys_fps / BASELINE_FPS, 3),
        "system_wall_fps_incl_mapping": round(fps_wall, 2),
        # wall-time decomposition + the colocated-host estimate it implies
        # (VERDICT r4 #5): link waits swapped for measured device time
        "wall_decomp_s": decomp,
        "system_wall_fps_excl_rtt_est": round(fps_wall_excl_rtt, 2),
        "kernel_frames_per_s_per_chip": round(kernel_fps, 2),
        "kernel_vs_baseline": round(kernel_fps / BASELINE_FPS, 3),
        "system_ate_sim3_m": round(sys_ate, 4),
        "system_tracked_frac": round(tracked, 3),
    }))


if __name__ == "__main__":
    main()
