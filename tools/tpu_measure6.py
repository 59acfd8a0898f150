"""TPU measurement batch #6 (ONE process per tunnel-budget rules):

A. Extraction stage decomposition at the bench config (640x480, 8 levels,
   1024 kpts): pyramid alone; pyramid+detect; pyramid+detect+blur; full
   extract.  Locates the remaining ~1.9 ms.
B. Pose-LM latency floor: a 40-step scan of (i) the 6x6 damped solve alone,
   (ii) the einsum+solve, (iii) an unrolled forward/backward-substitution
   Cholesky solve — is jnp.linalg.solve the latency culprit?

Run:  python tools/tpu_measure6.py
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
    from openvslam_tpu.models.frontend import OrbFrontend
    from openvslam_tpu.ops import fast, orb, pyramid

    print("backend:", jax.devices(), flush=True)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 255, (480, 640)), jnp.uint8)
    fe = OrbFrontend(rows=480, cols=640, max_keypts=1024, num_levels=8)

    # --- A: extraction stages ---
    @jax.jit
    def stage_pyr(image_u8):
        return pyramid.build_pyramid(image_u8.astype(jnp.float32), 8, 1.2)

    @jax.jit
    def stage_detect(image_u8):
        lv = pyramid.build_pyramid(image_u8.astype(jnp.float32), 8, 1.2)
        out = []
        for l, (li, b) in enumerate(zip(lv, fe.budgets)):
            out.append(fast.detect_level(li, 20.0, 7.0, b, cell=fe.cell))
        return out

    @jax.jit
    def stage_blur(image_u8):
        lv = pyramid.build_pyramid(image_u8.astype(jnp.float32), 8, 1.2)
        out = []
        for l, (li, b) in enumerate(zip(lv, fe.budgets)):
            out.append(fast.detect_level(li, 20.0, 7.0, b, cell=fe.cell))
            out.append(pyramid.gaussian_blur(li))
        return out

    full = jax.jit(lambda im: fe._extract_impl(im, None))

    t_p = _time(stage_pyr, (img,))
    t_d = _time(stage_detect, (img,))
    t_b = _time(stage_blur, (img,))
    t_f = _time(full, (img,))
    print(f"pyramid            {t_p:.3f} ms", flush=True)
    print(f"+detect            {t_d:.3f} ms  (detect ~{t_d - t_p:.3f})", flush=True)
    print(f"+blur              {t_b:.3f} ms  (blur ~{t_b - t_d:.3f})", flush=True)
    print(f"full extract       {t_f:.3f} ms  (describe+pack ~{t_f - t_b:.3f})",
          flush=True)

    # --- B: LM-iteration latency floor ---
    H0 = jnp.asarray(rng.standard_normal((6, 6)), jnp.float32)
    H0 = H0 @ H0.T + 6 * jnp.eye(6)
    g0 = jnp.asarray(rng.standard_normal(6), jnp.float32)
    A0 = jnp.asarray(rng.standard_normal((1024, 2, 7)), jnp.float32)
    w0 = jnp.abs(jnp.asarray(rng.standard_normal(1024), jnp.float32))

    @jax.jit
    def scan_solve(H, g):
        def body(c, _):
            x = jnp.linalg.solve(H + c * jnp.eye(6), g)
            return c + x[0] * 1e-9, None
        return jax.lax.scan(body, jnp.float32(1.0), None, length=40)[0]

    @jax.jit
    def scan_einsum_solve(A, w, g):
        def body(c, _):
            G = jnp.einsum("nda,ndb,n->ab", A, A, w + c)
            x = jnp.linalg.solve(G[:6, :6] + jnp.eye(6), G[:6, 6])
            return c + x[0] * 1e-9, None
        return jax.lax.scan(body, jnp.float32(1.0), None, length=40)[0]

    def chol_solve6(H, g):
        # unrolled Cholesky forward/backward substitution for a 6x6 SPD system
        L = jnp.zeros_like(H)
        for j in range(6):
            d = jnp.sqrt(H[j, j] - jnp.sum(L[j, :j] ** 2))
            L = L.at[j, j].set(d)
            for i in range(j + 1, 6):
                L = L.at[i, j].set((H[i, j] - jnp.sum(L[i, :j] * L[j, :j])) / d)
        y = jnp.zeros(6)
        for i in range(6):
            y = y.at[i].set((g[i] - jnp.sum(L[i, :i] * y[:i])) / L[i, i])
        x = jnp.zeros(6)
        for i in reversed(range(6)):
            x = x.at[i].set((y[i] - jnp.sum(L[i + 1:, i] * x[i + 1:])) / L[i, i])
        return x

    @jax.jit
    def scan_chol(H, g):
        def body(c, _):
            x = chol_solve6(H + c * jnp.eye(6), g)
            return c + x[0] * 1e-9, None
        return jax.lax.scan(body, jnp.float32(1.0), None, length=40)[0]

    t1 = _time(scan_solve, (H0, g0))
    t2 = _time(scan_einsum_solve, (A0, w0, g0))
    t3 = _time(scan_chol, (H0, g0))
    print(f"40x linalg.solve         {t1:.3f} ms ({t1 / 40 * 1000:.1f} us/iter)",
          flush=True)
    print(f"40x einsum+solve         {t2:.3f} ms", flush=True)
    print(f"40x unrolled cholesky    {t3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
