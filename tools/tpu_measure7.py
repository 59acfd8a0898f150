"""TPU measurement batch #7 (ONE process per tunnel-budget rules):

A. FrameStep A/B: describe impl mxu2 (batched-levels, new default) vs mxu
   (per-level), both with the block-Schur 6x6 LM solve and Pallas matcher.
B. Standalone pose optimizer with solve6_spd (was 1.57 ms with LU).
C. Extraction alone under mxu2.

Run:  python tools/tpu_measure7.py
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
    from openvslam_tpu.ops import orb

    print("backend:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    rng = np.random.default_rng(7)

    # B: standalone pose optimizer
    N = 1024
    X = jnp.asarray(rng.standard_normal((N, 3)) * 2 + [0, 0, 6], jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)
    uv, _, vis = cam.project(X)
    sig = jnp.ones(N, jnp.float32)
    opt = make_pose_optimizer(cam)
    t = _time(opt, (T, X, uv, sig, vis))
    print(f"pose_opt 4x10 N=1024 (solve6): {t:.3f} ms  (was 1.574 LU)",
          flush=True)

    args = None
    for name in ("mxu2", "mxu"):
        orb._brief_name = name
        fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
        if args is None:
            args = fs.example_args()
        print(f"compiling FrameStep [{name}]...", flush=True)
        t = _time(fs.step, args)
        print(f"FrameStep [{name}] = {t:.3f} ms  ({1000.0 / t:.1f} fps)",
              flush=True)
        if name == "mxu2":
            ex = jax.jit(lambda im: fs.frontend._extract_impl(im, None))
            t_e = _time(ex, (args[0],))
            print(f"extract [mxu2] = {t_e:.3f} ms  (was 1.913)", flush=True)


if __name__ == "__main__":
    main()
