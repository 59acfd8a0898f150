"""Round-2 follow-up TPU probe: steady-state FrameStep timing + xplane trace,
all in ONE process (the axon tunnel is single-tenant; batch measurements).

Measures the effect of the cross-level detection batching (grouped FAST
launches + one batched top-k; ops.fast.detect_levels) against the r2
steady-state baseline of ~1.14 ms/frame (866-881 fps).

Run:  timeout 900 python tools/tpu_r2b_probe.py
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

    print("devices:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    args = fs.example_args()
    args = jax.device_put(args)
    jax.block_until_ready(args)

    t0 = time.perf_counter()
    out = fs.step(*args)
    jax.block_until_ready(out)
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s", flush=True)

    # steady state: one untimed pass (allocator/dispatch warmup)
    for _ in range(60):
        out = fs.step(*args)
    jax.block_until_ready(out)

    for rep in range(3):
        n = 120
        t0 = time.perf_counter()
        for _ in range(n):
            out = fs.step(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"steady rep {rep}: {dt / n * 1e3:.3f} ms/frame = {n / dt:.1f} fps",
              flush=True)

    # dispatch-overhead A/B: jit call (tracing-cache lookup + pytree flatten
    # per call) vs the AOT-compiled executable invoked directly
    compiled = fs.step.lower(*args).compile()
    out2 = compiled(*args)
    jax.block_until_ready(out2)
    np.testing.assert_allclose(np.asarray(out.T_cw), np.asarray(out2.T_cw))
    for rep in range(2):
        n = 120
        t0 = time.perf_counter()
        for _ in range(n):
            out2 = compiled(*args)
        jax.block_until_ready(out2)
        dt = time.perf_counter() - t0
        print(f"AOT rep {rep}: {dt / n * 1e3:.3f} ms/frame = {n / dt:.1f} fps",
              flush=True)

    outdir = "/tmp/jaxtrace_r2b"
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = fs.step(*args)
        jax.block_until_ready(out)
    print("trace written", flush=True)

    import glob
    pbs = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    print("xplane:", pbs, flush=True)
    if pbs:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import parse_xplane
        parse_xplane.parse(pbs[-1], 50)


if __name__ == "__main__":
    main()
