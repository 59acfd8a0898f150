"""TPU measurement batch #13 (ONE process per tunnel-budget rules):

The fused pose-LM Pallas kernel on the real backend: compiled equality vs
the analytic XLA schedule, and timing vs the autodiff XLA core (~1.52 ms).

Run:  python tools/tpu_measure13.py
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
    from openvslam_tpu.optimize.pose_optimizer import make_pose_optimizer
    from openvslam_tpu.optimize import residuals as R
    from openvslam_tpu.ops.pallas.pose_lm_kernel import (
        pose_lm_pallas, pose_lm_xla_reference)

    print("backend:", jax.devices(), flush=True)
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0,
                             focal_x_baseline=50.0)
    kw = dict(fx=520.0, fy=520.0, cx=320.0, cy=240.0, fxb=50.0,
              chi2_thr=R.CHI2_2D)
    rng = np.random.default_rng(7)

    for N in (1024, 4096):
        X = jnp.asarray(rng.standard_normal((N, 3)) * 2 + [0, 0, 6],
                        jnp.float32)
        T = jnp.eye(4, dtype=jnp.float32)
        uv, _, vis = cam.project(X)
        uv = uv + jnp.asarray(rng.standard_normal((N, 2)), jnp.float32)
        obs = jnp.concatenate([uv, jnp.full((N, 1), -1.0)], 1)
        sig = jnp.ones(N, jnp.float32)

        print(f"compiling pallas LM N={N}...", flush=True)
        T_k, inl_k, n_k, c2_k = pose_lm_pallas(T, X, obs, sig, vis, **kw)
        T_a, inl_a, n_a, c2_a = jax.jit(
            lambda *p: pose_lm_xla_reference(*p, **kw))(T, X, obs, sig, vis)
        dT = float(jnp.abs(T_k - T_a).max())
        agree = float((inl_k == inl_a).mean())
        print(f"equality N={N}: |dT|max={dT:.2e} inlier-agree={agree:.4f} "
              f"n={int(n_k)} vs {int(n_a)}", flush=True)

        t_p = _time(lambda *p: pose_lm_pallas(*p, **kw), (T, X, obs, sig, vis))
        # force the autodiff XLA core (make_pose_optimizer now dispatches to
        # the pallas kernel on accelerators)
        os.environ["OPENVSLAM_TPU_PALLAS_POSELM"] = "0"
        core = make_pose_optimizer(cam)
        os.environ.pop("OPENVSLAM_TPU_PALLAS_POSELM", None)
        t_x = _time(core, (T, X, uv, sig, vis))
        print(f"LM 4x10 N={N}: autodiff-XLA {t_x:.3f} ms, pallas {t_p:.3f} ms "
              f"({t_x / t_p:.1f}x)", flush=True)


if __name__ == "__main__":
    main()
