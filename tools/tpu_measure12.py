"""TPU measurement batch #12 (ONE process per tunnel-budget rules):

Pose-LM with the carried-state scan body (one jacfwd pass/iter, free round
boundaries: 84 -> 41 evaluation passes) — standalone and fused FrameStep.

Run:  python tools/tpu_measure12.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, n=50, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frame_step import FrameStep
    from openvslam_tpu.optimize.pose_optimizer import make_pose_optimizer

    print("backend:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    rng = np.random.default_rng(7)
    N = 1024
    X = jnp.asarray(rng.standard_normal((N, 3)) * 2 + [0, 0, 6], jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)
    uv, _, vis = cam.project(X)
    sig = jnp.ones(N, jnp.float32)
    opt = make_pose_optimizer(cam)
    t = _time(opt, (T, X, uv, sig, vis))
    print(f"pose_opt 4x10 N=1024 (carried): {t:.3f} ms  (was 1.574)", flush=True)

    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    args = fs.example_args()
    print("compiling FrameStep...", flush=True)
    t = _time(fs.step, args)
    print(f"FrameStep = {t:.3f} ms  ({1000.0 / t:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
