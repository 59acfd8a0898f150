"""TPU measurement batch #10 (ONE process per tunnel-budget rules):

Bisect describe_patches (0.86 ms standalone, tools/tpu_measure9.py) into
moments/angle -> one-hot construction -> selection matmul -> mul-reduce+pack,
by returning reductions of successive intermediates (prevents DCE).

Run:  python tools/tpu_measure10.py
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
    from openvslam_tpu.ops import orb

    print("backend:", jax.devices(), flush=True)
    rng = np.random.default_rng(3)
    N = 1024
    r = orb.PATCH_RADIUS
    d = 2 * r + 1
    patches = jnp.asarray(rng.uniform(0, 255, (N, d, d)), jnp.float32)
    fx = jnp.zeros(N, jnp.float32)
    bf = jnp.bfloat16

    def upto(stage):
        def f(patch, fx, fy):
            ramp = jnp.arange(-r, r + 1, dtype=jnp.float32)
            m10 = jnp.einsum("nrc,c->n", patch, ramp)
            m01 = jnp.einsum("nrc,r->n", patch, ramp)
            angles = jnp.arctan2(m01, m10)
            if stage == "mom":
                return angles
            c = jnp.cos(angles)
            s = jnp.sin(angles)
            px = orb.BRIEF_PATTERN[None, :, :, 0]
            py = orb.BRIEF_PATTERN[None, :, :, 1]
            rx = c[:, None, None] * px - s[:, None, None] * py
            ry = s[:, None, None] * px + c[:, None, None] * py
            xi = jnp.clip(jnp.round(rx + fx[:, None, None]).astype(jnp.int32) + r, 0, d - 1)
            yi = jnp.clip(jnp.round(ry + fy[:, None, None]).astype(jnp.int32) + r, 0, d - 1)
            xi = xi.reshape(N, -1)
            yi = yi.reshape(N, -1)
            oh_y = (yi[:, :, None] == jnp.arange(d, dtype=jnp.int32)[None, None, :])
            oh_x = (xi[:, :, None] == jnp.arange(d, dtype=jnp.int32)[None, None, :])
            if stage == "oh":
                return (oh_y.astype(bf).sum(), oh_x.astype(bf).sum())
            tmp = jax.lax.dot_general(
                oh_y.astype(bf), patch.astype(bf),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if stage == "tmp":
                return tmp.sum()
            vals = jnp.sum(tmp * oh_x.astype(jnp.float32), axis=-1)
            vals = vals.reshape(N, orb.DESC_BITS, 2)
            bits = vals[..., 0] < vals[..., 1]
            return orb._pack_bits(bits), angles
        return jax.jit(f)

    prev = 0.0
    for stage in ("mom", "oh", "tmp", "full"):
        t = _time(upto(stage), (patches, fx, fx))
        print(f"upto {stage:4s}: {t:.3f} ms  (delta {t - prev:+.3f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
