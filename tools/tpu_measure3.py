"""TPU measurement batch #3 (ONE process per tunnel-budget rules):

Stage breakdown of the 4.2 ms fused FrameStep to find the next perf lever:

  t_full   — FrameStep, 4x10 pose-LM rounds (the bench configuration)
  t_nolm   — FrameStep with opt_rounds=0 (extraction + gate + match only)
  t_ex     — frontend extraction alone
  => LM cost    ~= t_full - t_nolm
     match cost ~= t_nolm - t_ex

Run:  python tools/tpu_measure3.py
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

    print("backend:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    args = fs.example_args()
    step = jax.jit(fs._step_impl)

    print("compiling full step...", flush=True)
    t_full = _time(step, args)
    print(f"t_full  = {t_full:.3f} ms  ({1000.0 / t_full:.1f} fps)", flush=True)

    fs0 = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096,
                    opt_rounds=0)
    step0 = jax.jit(fs0._step_impl)
    print("compiling no-LM step...", flush=True)
    t_nolm = _time(step0, args)
    print(f"t_nolm  = {t_nolm:.3f} ms", flush=True)

    ex = jax.jit(lambda img: fs.frontend._extract_impl(img, None))
    print("compiling extraction...", flush=True)
    t_ex = _time(ex, (args[0],))
    print(f"t_ex    = {t_ex:.3f} ms", flush=True)

    print(f"\npose-LM (4x10)   ~= {t_full - t_nolm:.3f} ms")
    print(f"gate+match       ~= {t_nolm - t_ex:.3f} ms")
    print(f"extraction       ~= {t_ex:.3f} ms")

    # per-iteration LM latency: 2 rounds x 10 iters variant
    fs2 = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096,
                    opt_rounds=2)
    step2 = jax.jit(fs2._step_impl)
    print("compiling 2-round step...", flush=True)
    t_2r = _time(step2, args)
    print(f"t_2round = {t_2r:.3f} ms  (per-round ~= {(t_full - t_2r) / 2:.3f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
