"""TPU measurement batch #15: the LIVE-pipeline TrackStep (extract + 2x
match + 2x pose LM in one program) with all Pallas kernels wired, mono and
stereo; plus bench.py's configuration for the official headline.

Run:  python tools/tpu_measure15.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, n=60, warmup=5):
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
    from openvslam_tpu.models.frontend import OrbFrontend
    from openvslam_tpu.models.track_step import TrackStep

    print("backend:", jax.devices(), flush=True)
    rng = np.random.default_rng(5)

    for mode in ("mono", "stereo"):
        cam = Perspective.create(
            fx=520.0, fy=520.0, cx=320.0, cy=240.0, cols=640, rows=480,
            fps=30.0, setup="stereo" if mode == "stereo" else "monocular",
            focal_x_baseline=120.0 if mode == "stereo" else 0.0,
        )
        fe = OrbFrontend(rows=480, cols=640, max_keypts=1024, num_levels=8)
        ts = TrackStep(cam, fe, lm_capacity=4096, mode=mode)
        P, L = fe.capacity, 4096
        img = jnp.asarray(rng.integers(0, 255, (480, 640)), jnp.uint8)
        aux = (jnp.asarray(rng.integers(0, 255, (480, 640)), jnp.uint8)
               if mode == "stereo" else None)
        T = jnp.eye(4, dtype=jnp.float32)
        args = (
            img, None, T,
            jnp.asarray(rng.standard_normal((P, 3)) * 2 + [0, 0, 6], jnp.float32),
            jnp.asarray(rng.integers(0, 2**32, (P, 8), np.int64), jnp.uint32),
            jnp.ones(P, bool), jnp.zeros(P, jnp.int32),
            jnp.asarray(rng.standard_normal((L, 3)) * 2 + [0, 0, 6], jnp.float32),
            jnp.asarray(rng.integers(0, 2, (L, 256)), jnp.int8),
            jnp.ones(L, bool), jnp.full(L, 10.0, jnp.float32),
            jnp.full(L, -1, jnp.int32),
            aux,
        )
        print(f"compiling TrackStep [{mode}]...", flush=True)
        t = _time(ts.step, args)
        print(f"TrackStep [{mode}] = {t:.3f} ms  ({1000.0 / t:.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
