"""Probe axon dispatch cost structure for the fused frame step:
  A: same device buffer every call          (tpu_measure saw 9.3 ms)
  B: cycle through 120 pre-staged buffers   (bench.py sees 24 ms)
  C: one stacked (N,H,W) device array + device-side dynamic index
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frame_step import FrameStep

    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480)
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    img, T, lp, ld, lv, ll = fs.example_args()

    rng = np.random.default_rng(0)
    imgs_np = [rng.integers(0, 255, (480, 640), np.uint8) for _ in range(120)]
    imgs = [jax.device_put(jnp.asarray(a)) for a in imgs_np]
    stack = jax.device_put(jnp.asarray(np.stack(imgs_np)))
    jax.block_until_ready((imgs, stack))

    out = fs.step(imgs[0], T, lp, ld, lv, ll)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(120):
        out = fs.step(imgs[0], T, lp, ld, lv, ll)
    jax.block_until_ready(out)
    a = (time.perf_counter() - t0) / 120 * 1000
    print(f"A same-buffer:     {a:.2f} ms", flush=True)

    t0 = time.perf_counter()
    for i in range(120):
        out = fs.step(imgs[i], T, lp, ld, lv, ll)
    jax.block_until_ready(out)
    b = (time.perf_counter() - t0) / 120 * 1000
    print(f"B distinct-buffer: {b:.2f} ms", flush=True)

    step_idx = jax.jit(
        lambda k, T, lp, ld, lv, ll: fs._step_impl(stack[k], T, lp, ld, lv, ll))
    out = step_idx(jnp.int32(0), T, lp, ld, lv, ll)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(120):
        out = step_idx(jnp.int32(i % 120), T, lp, ld, lv, ll)
    jax.block_until_ready(out)
    c = (time.perf_counter() - t0) / 120 * 1000
    print(f"C stacked-indexed: {c:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
