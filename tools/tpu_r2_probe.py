"""Round-2 TPU probe: bench timing + xplane trace + parsed per-op totals,
all in ONE process (the axon tunnel is single-tenant; batch measurements).

Run:  python tools/tpu_r2_probe.py
Prints bench fps, then the top-40 ops by self time from the trace.
"""
import glob
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

    print("backend:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    args = fs.example_args()
    t0 = time.perf_counter()
    out = fs.step(*args)
    jax.block_until_ready(out)
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

    # bench-style timed loop (static args; measures the device step)
    for reps in (40, 120):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fs.step(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"timed loop {reps}: {dt/reps*1e3:.3f} ms/frame = {reps/dt:.1f} fps",
              flush=True)

    outdir = "/tmp/jaxtrace_r2"
    with jax.profiler.trace(outdir):
        for _ in range(10):
            out = fs.step(*args)
        jax.block_until_ready(out)
    pbs = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    print("xplane:", pbs, flush=True)
    if pbs:
        import importlib
        px = importlib.import_module("parse_xplane")
        px.parse(pbs[-1], 60)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
