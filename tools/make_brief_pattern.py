"""Generate a decorrelated rBRIEF test pattern (ORB's learning procedure,
re-run on synthetic data): sample candidate point pairs in the patch disc,
evaluate their binary responses over many real (synthetic-scene) keypoint
patches, then greedily keep 256 tests with mean closest to 0.5 and low
correlation to already-selected tests.

Output: openvslam_tpu/assets/brief_pattern.npy  (256, 2, 2) float32.
Deterministic (fixed seeds).  Run from repo root:
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/make_brief_pattern.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PATCH_R = 15
N_TESTS = 256
N_CANDIDATES = 4000
MIN_SEP = 5.0          # min distance between the two points of a test


def collect_patches(n_scenes=8, per_scene=600):
    import jax.numpy as jnp
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frontend import OrbFrontend
    from openvslam_tpu.ops import pyramid
    from openvslam_tpu.utils import synthetic

    cam = Perspective.create(fx=350.0, fy=350.0, cx=208.0, cy=160.0,
                             cols=416, rows=320)
    fe = OrbFrontend(320, 416, max_keypts=per_scene, num_levels=4)
    rng = np.random.default_rng(99)
    patches = []
    for s in range(n_scenes):
        scene = synthetic.PatchSceneRenderer(rng, n_points=500, rows=320, cols=416)
        poses = synthetic.orbit_trajectory(3, radius=2.0 + 0.3 * s, target=(0, 0, 6))
        for i in range(3):
            img = scene.render(cam, poses[i]).astype(np.float32)
            blurred = np.asarray(pyramid.gaussian_blur(jnp.asarray(img)))
            kp = fe.extract(jnp.asarray(img.astype(np.uint8)))
            xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
            ang = np.asarray(kp.angle)[np.asarray(kp.valid)]
            H, W = blurred.shape
            for (x, y), a in zip(xy, ang):
                xi, yi = int(round(x)), int(round(y))
                if (PATCH_R + 1 <= xi < W - PATCH_R - 1
                        and PATCH_R + 1 <= yi < H - PATCH_R - 1):
                    p = blurred[yi - PATCH_R:yi + PATCH_R + 1,
                                xi - PATCH_R:xi + PATCH_R + 1]
                    # rotate patch to canonical orientation (steered BRIEF
                    # equivalence: learn in the rotated frame)
                    patches.append((p.copy(), a))
    return patches


def main():
    rng = np.random.default_rng(7)
    # candidate tests: uniform in the disc, separation >= MIN_SEP
    cands = []
    while len(cands) < N_CANDIDATES:
        pq = rng.uniform(-PATCH_R + 1, PATCH_R - 1, size=(2, 2))
        if (np.linalg.norm(pq[0]) < PATCH_R - 1 and np.linalg.norm(pq[1]) < PATCH_R - 1
                and np.linalg.norm(pq[0] - pq[1]) >= MIN_SEP):
            cands.append(pq)
    cands = np.array(cands, np.float32)               # (C,2,2)

    print("collecting patches...")
    patches = collect_patches()
    print(f"{len(patches)} patches")
    n = len(patches)

    # evaluate all candidate tests on all patches (rotated by kp angle)
    resp = np.zeros((n, N_CANDIDATES), bool)
    px = cands[:, :, 0]
    py = cands[:, :, 1]
    for i, (p, a) in enumerate(patches):
        c, s = np.cos(a), np.sin(a)
        rx = (c * px - s * py) + PATCH_R
        ry = (s * px + c * py) + PATCH_R
        xi = np.clip(np.round(rx).astype(int), 0, 2 * PATCH_R)
        yi = np.clip(np.round(ry).astype(int), 0, 2 * PATCH_R)
        vals = p[yi, xi]                              # (C,2)
        resp[i] = vals[:, 0] < vals[:, 1]

    mean = resp.mean(0)
    order = np.argsort(np.abs(mean - 0.5))
    R = resp.astype(np.float32)
    Rc = R - R.mean(0)
    std = Rc.std(0) + 1e-9

    selected = [int(order[0])]
    corr_thr = 0.2
    while len(selected) < N_TESTS:
        added = False
        for c in order:
            c = int(c)
            if c in selected:
                continue
            cs = np.abs(
                (Rc[:, c] @ Rc[:, selected]) / (len(R) * std[c] * std[selected])
            )
            if cs.max() < corr_thr:
                selected.append(c)
                added = True
                if len(selected) >= N_TESTS:
                    break
        if not added:
            corr_thr += 0.1
            print(f"relaxing correlation threshold to {corr_thr:.1f} "
                  f"({len(selected)} selected)")

    pattern = cands[selected]                         # (256,2,2)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "openvslam_tpu", "assets", "brief_pattern.npy")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.save(out, pattern)
    sel_mean = mean[selected]
    print(f"saved {out}; test means in [{sel_mean.min():.2f}, {sel_mean.max():.2f}]")


if __name__ == "__main__":
    main()
