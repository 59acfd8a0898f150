"""TPU measurement batch #9 (ONE process per tunnel-budget rules):

Split the ~1.87 ms describe stage: row gather vs one-hot patch matmul vs
batched describe (moments+steer+sample+pack).  Decides where a Pallas
describe kernel should sit.

Run:  python tools/tpu_measure9.py
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
    r = orb.PATCH_RADIUS

    def levels_and_kpts(image_u8):
        lv = pyramid.build_pyramid(image_u8.astype(jnp.float32), 8, 1.2)
        out = []
        for l, (li, b) in enumerate(zip(lv, fe.budgets)):
            xy, resp, valid = fast.detect_level(li, 20.0, 7.0, b, cell=fe.cell)
            out.append((pyramid.gaussian_blur(li), xy))
        return out

    @jax.jit
    def stage_rows(image_u8):
        acc = []
        for blurred, xy in levels_and_kpts(image_u8):
            h, w = blurred.shape
            y0 = jnp.clip(jnp.round(xy[:, 1]), r, h - r - 1).astype(jnp.int32)
            offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
            acc.append(blurred[y0[:, None] + offs[None, :], :].sum())
        return sum(acc)

    @jax.jit
    def stage_patches(image_u8):
        acc = []
        for blurred, xy in levels_and_kpts(image_u8):
            p, fx, fy = orb.extract_patches_onehot(blurred, xy)
            acc.append((p, fx, fy))
        return acc

    @jax.jit
    def stage_full(image_u8):
        return fe._extract_impl(image_u8, None)

    patches = jnp.concatenate([p for p, _, _ in stage_patches(img)], 0)
    fx = jnp.zeros(patches.shape[0], jnp.float32)
    desc = jax.jit(orb.describe_patches)

    t_rows = _time(stage_rows, (img,))
    t_pat = _time(stage_patches, (img,))
    t_desc = _time(desc, (patches, fx, fx))
    t_full = _time(stage_full, (img,))
    print(f"rows gather (all levels)     {t_rows:.3f} ms", flush=True)
    print(f"+one-hot patch matmul        {t_pat:.3f} ms", flush=True)
    print(f"batched describe (N=1024)    {t_desc:.3f} ms", flush=True)
    print(f"full extract [mxu]           {t_full:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
