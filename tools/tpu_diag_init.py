"""Diagnose why two-view initialization fails on the axon TPU backend while
passing on CPU (tpu_measure2: tracked=0/60).  One process; prints extraction
stats and each init stage for a frame pair that initializes on CPU.

    python tools/tpu_diag_init.py            # TPU (axon default)
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/tpu_diag_init.py   # CPU ref
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from openvslam_tpu.camera import Perspective
    from openvslam_tpu.models.frontend import OrbFrontend
    from openvslam_tpu.data import Frame
    from openvslam_tpu.initialize.two_view import initialize_two_view
    from openvslam_tpu.utils import synthetic

    print("backend:", jax.default_backend(), flush=True)
    rows, cols = 480, 640
    cam = Perspective.create(fx=520.0, fy=520.0, cx=320.0, cy=240.0,
                             cols=cols, rows=rows, fps=30.0)
    rng = np.random.default_rng(5)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=900, center=(0, 0, 6), extent=(7, 5, 2.5),
        rows=rows, cols=cols)
    poses = synthetic.orbit_trajectory(60, radius=2.5, target=(0, 0, 6),
                                       arc=np.pi / 5)
    fe = OrbFrontend(rows, cols, max_keypts=1000, num_levels=8,
                     scale_factor=1.2)
    i0, i1 = 0, 4
    img0 = scene.render(cam, poses[i0])
    img1 = scene.render(cam, poses[i1])
    kp0 = fe.extract(jnp.asarray(img0))
    kp1 = fe.extract(jnp.asarray(img1))
    f0 = Frame.from_keypoints(0, 0.0, kp0, cam)
    f1 = Frame.from_keypoints(1, 0.2, kp1, cam)
    print(f"extract: f0 valid={f0.num_valid} f1 valid={f1.num_valid}",
          flush=True)
    print(f"  f0 xy range: {f0.xy[f0.valid].min(0)} .. {f0.xy[f0.valid].max(0)}",
          flush=True)
    d0 = f0.desc_i8[f0.valid]
    print(f"  f0 desc bit-mean: {d0.mean():.3f} (0.5 = healthy rBRIEF)",
          flush=True)

    key = jax.random.PRNGKey(1)
    res = initialize_two_view(key, f0, f1, cam)
    print(f"init: success={res.success}", flush=True)
    if res.success:
        print(f"  inliers={int(res.is_inlier.sum())} "
              f"T21 t={res.T_21[:3, 3]}", flush=True)
    else:
        # drill: raw area match count
        from openvslam_tpu.ops import match as M
        idx, dist = M.match_descriptors(
            jnp.asarray(f0.desc_i8), jnp.asarray(f1.desc_i8),
            jnp.asarray(f0.valid), jnp.asarray(f1.valid),
            max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9, cross_check=True,
        )
        idx = np.asarray(idx)
        nm = int((idx >= 0).sum())
        print(f"  descriptor matches f0->f1: {nm}", flush=True)
        dd = np.asarray(dist)[idx >= 0]
        if nm:
            print(f"  match dist: median={np.median(dd):.0f}", flush=True)


if __name__ == "__main__":
    main()
