"""TPU measurement batch #4 (ONE process per tunnel-budget rules):

1. Compiled Pallas projection-match kernel vs the XLA composition on the
   REAL backend — exact equality (interpret-mode equality is covered by
   tests/test_pallas_match.py; this is the compiled-kernel check).
2. Standalone matcher timing, XLA vs Pallas, at the tracking shapes.
3. Fused FrameStep timing with the Pallas matcher (default on TPU) vs
   with OPENVSLAM_TPU_PALLAS_MATCH=0 (the 260-fps baseline path).

Run:  python tools/tpu_measure4.py
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


def _problem(rng, L, K, cols=640, rows=480):
    a_desc = rng.integers(0, 2, (L, 256)).astype(np.int8)
    b_desc = rng.integers(0, 2, (K, 256)).astype(np.int8)
    for i in range(0, min(L, K), 3):
        b_desc[i % K] = a_desc[i]
    uv = rng.uniform(0, [cols, rows], (L, 2)).astype(np.float32)
    b_xy = rng.uniform(0, [cols, rows], (K, 2)).astype(np.float32)
    b_xy[: K // 2] = uv[: K // 2] + rng.normal(0, 5, (K // 2, 2))
    vis = rng.random(L) > 0.1
    b_val = rng.random(K) > 0.1
    radius = rng.uniform(4, 30, L).astype(np.float32)
    pred = rng.integers(-1, 8, L).astype(np.int32)
    b_lvl = rng.integers(0, 8, K).astype(np.int32)
    return a_desc, b_desc, uv, vis, radius, pred, b_xy, b_lvl, b_val


def main():
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.ops import match as M
    from openvslam_tpu.ops.pallas.match_kernel import projection_match_pallas

    print("backend:", jax.devices(), flush=True)
    rng = np.random.default_rng(4)

    def xla_path(a_desc, b_desc, uv, vis, radius, pred, b_xy, b_lvl, b_val,
                 max_dist=M.HAMMING_DIST_THR_HIGH, ratio=0.9, cross=True):
        gate = M.projection_gate(uv, vis, b_xy, radius)
        sgate = jnp.abs(b_lvl[None, :] - pred[:, None]) <= 1
        gate = gate & (sgate | (pred < 0)[:, None])
        return M.match_descriptors(a_desc, b_desc, vis, b_val, gate=gate,
                                   max_dist=max_dist, ratio=ratio,
                                   cross_check=cross)

    # --- 1. compiled equality ---
    for L, K in [(512, 1024), (4096, 1024), (300, 257)]:
        prob = [jnp.asarray(x) for x in _problem(rng, L, K)]
        for ratio, cross in [(0.9, True), (None, False)]:
            i_ref, d_ref = jax.jit(
                lambda *p: xla_path(*p, ratio=ratio, cross=cross))(*prob)
            i_k, d_k = projection_match_pallas(
                *prob, max_dist=M.HAMMING_DIST_THR_HIGH, ratio=ratio,
                cross_check=cross)
            ok_i = bool((np.asarray(i_k) == np.asarray(i_ref)).all())
            m = np.asarray(i_ref) >= 0
            ok_d = bool((np.asarray(d_k)[m] == np.asarray(d_ref)[m]).all())
            n = int(m.sum())
            print(f"equality L={L} K={K} ratio={ratio} cross={cross}: "
                  f"idx={ok_i} dist={ok_d} matches={n}", flush=True)
            assert ok_i and ok_d

    # --- 2. standalone matcher timing ---
    for L, K in [(4096, 1024), (4096, 2048)]:
        prob = [jnp.asarray(x) for x in _problem(rng, L, K)]
        f_x = jax.jit(lambda *p: xla_path(*p))
        t_x = _time(f_x, prob)
        t_p = _time(lambda *p: projection_match_pallas(
            *p, max_dist=M.HAMMING_DIST_THR_HIGH, ratio=0.9,
            cross_check=True), prob)
        print(f"matcher L={L} K={K}: xla {t_x:.3f} ms  pallas {t_p:.3f} ms "
              f"({t_x / t_p:.2f}x)", flush=True)

    # --- 3. fused FrameStep A/B ---
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frame_step import FrameStep

    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=640, rows=480, fps=30.0)
    args = None
    for env, tag in [("", "pallas-match"), ("0", "xla-match")]:
        os.environ["OPENVSLAM_TPU_PALLAS_MATCH"] = env
        fs = FrameStep(cam, max_keypts=1024, num_levels=8, lm_capacity=4096)
        if args is None:
            args = fs.example_args()
        print(f"compiling FrameStep [{tag}]...", flush=True)
        t = _time(fs.step, args)
        print(f"FrameStep [{tag}] = {t:.3f} ms  ({1000.0 / t:.1f} fps)",
              flush=True)
    os.environ.pop("OPENVSLAM_TPU_PALLAS_MATCH", None)


if __name__ == "__main__":
    main()
