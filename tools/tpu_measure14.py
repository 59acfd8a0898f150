"""TPU measurement batch #14: FrameStep with the fused Pallas pose-LM kernel
(+ Pallas matcher + Pallas FAST) — the new bench configuration.

Run:  python tools/tpu_measure14.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, n=100, warmup=5):
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
    for env, tag in [("", "pallas-LM"), ("0", "xla-LM")]:
        os.environ["OPENVSLAM_TPU_PALLAS_POSELM"] = env
        fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
        args = fs.example_args()
        print(f"compiling FrameStep [{tag}]...", flush=True)
        t = _time(fs.step, args)
        print(f"FrameStep [{tag}] = {t:.3f} ms  ({1000.0 / t:.1f} fps)",
              flush=True)
    os.environ.pop("OPENVSLAM_TPU_PALLAS_POSELM", None)


if __name__ == "__main__":
    main()
