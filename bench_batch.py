"""Aggregate multi-stream throughput: K concurrent tracking streams per chip.

The single-stream fused step (bench.py) is latency-bound — its 1k-keypoint
tensors fill the v5e MXU to 12-15%.  This bench runs the SAME per-frame
tracking work for K independent streams in one batched program
(models/batch_step.py; per-stream results bit-equal to FrameStep) and
reports aggregate tracked frames/s/chip — the BASELINE config-#5
(concurrent sessions) / offline-mapping regime.

Prints one JSON line per batch size:
  {"metric": "batched_tracked_frames_per_s_per_chip", "batch": B,
   "value": ..., "unit": "frames/s", "vs_baseline": ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

BASELINE_FPS = 30.0


def main():
    import jax
    import jax.numpy as jnp

    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.batch_step import BatchFrameStep
    from openvslam_tpu.utils import synthetic

    batches = [int(b) for b in (sys.argv[1:] or ["1", "4", "8"])]

    cam = Perspective.create(
        fx=520.0, fy=520.0, cx=320.0, cy=240.0, cols=640, rows=480, fps=30.0,
    )
    bs = BatchFrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)

    rng = np.random.default_rng(5)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=900, center=(0, 0, 6), extent=(7, 5, 2.5), rows=480, cols=640
    )
    n_frames = 16
    poses = synthetic.orbit_trajectory(n_frames, radius=2.5, target=(0, 0, 6),
                                       arc=np.pi / 4)
    images = np.stack([scene.render(cam, poses[i]) for i in range(n_frames)])

    kp0 = bs.frontend.extract(jnp.asarray(images[0]))
    kp_xy = np.asarray(kp0.xy)
    kp_valid = np.asarray(kp0.valid)
    kp_desc = np.asarray(kp0.desc_i8)
    pc0 = (poses[0][:3, :3] @ scene.points.T).T + poses[0][:3, 3]
    uv0, _, vis0 = cam.project(jnp.asarray(pc0, jnp.float32))
    uv0 = np.asarray(uv0)
    vis0 = np.asarray(vis0)
    L = bs.lm_capacity
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

    for B in batches:
        sel = np.arange(B) % n_frames
        imgs_dev = jax.device_put(jnp.asarray(images[sel]))
        T_dev = jax.device_put(jnp.asarray(
            np.stack([poses[i].astype(np.float32) for i in sel])))
        pos = jnp.broadcast_to(jnp.asarray(lm_pos), (B, L, 3))
        desc = jnp.broadcast_to(jnp.asarray(lm_desc), (B, L, 256))
        val = jnp.broadcast_to(jnp.asarray(lm_valid), (B, L))
        lvl = jnp.broadcast_to(jnp.asarray(lm_lvl), (B, L))
        jax.block_until_ready((imgs_dev, T_dev))

        out = bs.step(imgs_dev, T_dev, pos, desc, val, lvl)
        jax.block_until_ready(out)
        # warmup to steady state (see bench.py)
        for _ in range(max(2, 40 // B)):
            out = bs.step(imgs_dev, T_dev, pos, desc, val, lvl)
        jax.block_until_ready(out)

        reps = max(3, 120 // B)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = bs.step(imgs_dev, T_dev, pos, desc, val, lvl)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        fps = reps * B / dt
        print(
            f"[bench_batch] B={B}: {dt/reps*1e3:.3f} ms/step "
            f"({dt/reps/B*1e3:.3f} ms/frame), inliers0={int(out.num_inliers[0])}",
            file=sys.stderr,
        )
        print(json.dumps({
            "metric": "batched_tracked_frames_per_s_per_chip",
            "batch": B,
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / BASELINE_FPS, 3),
        }))


if __name__ == "__main__":
    main()
