"""One-process TPU measurement batch (tunnel budget: ~2-3 processes/window).

Runs the fused frame-step bench for the selected BRIEF variant and, if the
first measurement succeeds, a second variant for comparison — all in one
process so a single session claim covers everything.

    python tools/tpu_measure.py mxu gather
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(variant: str):
    # variant must be set before openvslam_tpu.ops.orb is imported; reload
    os.environ["OPENVSLAM_TPU_BRIEF"] = variant
    for mod in [m for m in list(sys.modules) if m.startswith("openvslam_tpu")]:
        del sys.modules[mod]
    import jax
    import jax.numpy as jnp
    import numpy as np
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frame_step import FrameStep

    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480)
    fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
    args = fs.example_args()
    t0 = time.perf_counter()
    out = fs.step(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    reps = 40
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fs.step(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"[{variant}] frame step: {ms:.2f} ms ({1000/ms:.1f} fps) "
          f"compile {compile_s:.0f}s", flush=True)
    return ms


def main():
    variants = sys.argv[1:] or ["mxu", "gather"]
    for v in variants:
        measure(v)


if __name__ == "__main__":
    main()
