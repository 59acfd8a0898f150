"""TPU measurement batch #16: FrameStep after (a) iterative per-cell top-k
(replacing the lax.top_k sort custom call) and (b) the prefix-sum FAST arc.
Profiled targets: FAST 560 us + top_k 284 us of the 1.59 ms device step.

Run:  python tools/tpu_measure16.py
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
    from openvslam_tpu.ops.pallas.fast_kernel import fast_score_maps_pallas
    from openvslam_tpu.ops import fast

    print("backend:", jax.devices(), flush=True)
    rng = np.random.default_rng(3)

    # compiled equality of the new FAST arc vs the XLA formulation
    img = jnp.asarray(rng.integers(0, 255, (480, 640)).astype(np.float32))
    hi_r, lo_r = jax.jit(lambda im: fast.fast_score_maps(im, [20.0, 7.0]))(img)
    hi, lo = fast_score_maps_pallas(img, 20.0, 7.0)
    d = float(jnp.abs(hi[4:-4, 4:-4] - hi_r[4:-4, 4:-4]).max())
    d2 = float(jnp.abs(lo[4:-4, 4:-4] - lo_r[4:-4, 4:-4]).max())
    print(f"FAST compiled equality: |dhi|max={d:.2e} |dlo|max={d2:.2e}",
          flush=True)
    t_f = _time(lambda im: fast_score_maps_pallas(im, 20.0, 7.0), (img,))
    print(f"FAST level-0 call: {t_f:.3f} ms", flush=True)

    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    args = fs.example_args()
    print("compiling FrameStep...", flush=True)
    t = _time(fs.step, args)
    print(f"FrameStep = {t:.3f} ms  ({1000.0 / t:.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
