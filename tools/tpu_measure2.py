"""TPU measurement batch #2 (one process per tunnel-budget rules):

  1. REAL pipeline System fps: full monocular SLAM on a synthetic sequence
     with the fused TrackStep (one device call/frame) vs OPENVSLAM_TPU_FUSED=0
     would need a separate process — measure fused only here, the unfused
     number is in NOTES.md (~6 calls/frame).
  2. Pallas FAST kernel on the real backend (compiled, not interpret):
     correctness vs the XLA version + timing.

    python tools/tpu_measure2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_system_fps(async_mapping: bool = False):
    import jax
    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic

    rows, cols = 480, 640
    cfg = Config.from_dict({
        "Camera": {"name": "bench", "setup": "monocular", "model": "perspective",
                   "fx": 520.0, "fy": 520.0, "cx": cols / 2, "cy": rows / 2,
                   "cols": cols, "rows": rows, "fps": 30},
        "Feature": {"max_num_keypts": 1000, "num_levels": 8,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(5)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=900, center=(0, 0, 6), extent=(7, 5, 2.5),
        rows=rows, cols=cols)
    n = 60
    poses = synthetic.orbit_trajectory(n, radius=2.5, target=(0, 0, 6),
                                       arc=np.pi / 5)
    print("rendering...", flush=True)
    imgs = [scene.render(cam, poses[i]) for i in range(n)]
    print(f"running system (async_mapping={async_mapping})...", flush=True)
    s = System(cfg, async_mapping=async_mapping)
    s.startup()
    for i in range(n):
        t0 = time.perf_counter()
        p = s.feed_monocular_frame(imgs[i], i / 30.0)
        dt = (time.perf_counter() - t0) * 1000
        if i % 10 == 0 or dt > 3000:
            print(f"  f{i}: {dt:.0f} ms tracked={p is not None}", flush=True)
    s.shutdown()
    st = s.stats()
    # drop warmup/compile frames: median over the last 40
    tt = np.array(s.track_times[-40:]) * 1000
    tag = "system-async" if async_mapping else "system"
    print(f"[{tag}] median {np.median(tt):.2f} ms/frame "
          f"({1000 / np.median(tt):.1f} fps) p90 {np.percentile(tt, 90):.1f} "
          f"fused={st['fused_frames']}/{n} "
          f"tracked={st['frames_tracked']}/{n}", flush=True)


def measure_pallas_fast():
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.ops import fast
    from openvslam_tpu.ops.pallas.fast_kernel import fast_score_maps_pallas

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (480, 640)).astype(np.float32))
    try:
        t0 = time.perf_counter()
        hi, lo = fast_score_maps_pallas(img, 20.0, 7.0, interpret=False)
        jax.block_until_ready((hi, lo))
        print(f"[pallas-fast] compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)
    except Exception as e:
        print(f"[pallas-fast] COMPILE/RUN FAILED: {type(e).__name__}: {e}",
              flush=True)
        return
    hi_ref, lo_ref = fast.fast_score_maps(img, [20.0, 7.0])
    b = 4
    err = float(jnp.abs(hi[b:-b, b:-b] - hi_ref[b:-b, b:-b]).max())
    print(f"[pallas-fast] max abs err vs XLA (interior): {err:.5f}", flush=True)
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        hi, lo = fast_score_maps_pallas(img, 20.0, 7.0, interpret=False)
    jax.block_until_ready((hi, lo))
    ms_pallas = (time.perf_counter() - t0) / reps * 1000
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fast.fast_score_maps(img, [20.0, 7.0])
    jax.block_until_ready(r)
    ms_xla = (time.perf_counter() - t0) / reps * 1000
    print(f"[pallas-fast] {ms_pallas:.3f} ms vs XLA {ms_xla:.3f} ms "
          f"(480x640 dual-threshold)", flush=True)


def main():
    which = sys.argv[1:] or ["system", "pallas"]
    if "system" in which:
        measure_system_fps()
    if "system_async" in which:
        measure_system_fps(async_mapping=True)
    if "pallas" in which:
        measure_pallas_fast()


if __name__ == "__main__":
    main()
