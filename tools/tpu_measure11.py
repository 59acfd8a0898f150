"""TPU measurement batch #11 (ONE process per tunnel-budget rules):

Binned steering (constant per-bin selection tables) vs continuous one-hot
construction: extraction and fused FrameStep timing.

Run:  python tools/tpu_measure11.py
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
    from openvslam_tpu.ops import orb

    print("backend:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    rng = np.random.default_rng(3)

    # standalone describe core
    N, d = 1024, 31
    patches = jnp.asarray(rng.uniform(0, 255, (N, d, d)), jnp.float32)
    fx = jnp.zeros(N, jnp.float32)
    t_c = _time(jax.jit(orb.describe_patches), (patches, fx, fx))
    t_b = _time(jax.jit(orb.describe_patches_binned), (patches,))
    print(f"describe core: continuous {t_c:.3f} ms, binned {t_b:.3f} ms",
          flush=True)

    args = None
    for name in ("binned", "mxu"):
        orb._brief_name = name
        fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
        if args is None:
            args = fs.example_args()
        ex = jax.jit(lambda im, f=fs: f.frontend._extract_impl(im, None))
        print(f"compiling [{name}]...", flush=True)
        t_e = _time(ex, (args[0],))
        t = _time(fs.step, args)
        print(f"extract [{name}] = {t_e:.3f} ms;  FrameStep = {t:.3f} ms "
              f"({1000.0 / t:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
