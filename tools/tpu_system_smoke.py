"""Full System smoke on the REAL TPU backend: synthetic mono sequence
through the public API (host map logic + fused TrackStep + all Pallas
kernels compiled on hardware).  Prints tracked ratio, ATE and fps.

Run:  python tools/tpu_system_smoke.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic, evaluate

    print("backend:", jax.devices(), flush=True)
    cfg = Config.from_dict({
        "Camera": {"name": "smoke", "setup": "monocular",
                   "model": "perspective",
                   "fx": 350.0, "fy": 350.0, "cx": 208.0, "cy": 160.0,
                   "cols": 416, "rows": 320, "fps": 20},
        "Feature": {"max_num_keypts": 600, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(11)
    scene = synthetic.PatchSceneRenderer(rng, n_points=700, center=(0, 0, 6),
                                         extent=(6, 4.5, 2.5),
                                         rows=cam.rows, cols=cam.cols)
    n = 40
    gt = synthetic.orbit_trajectory(n, radius=2.5, target=(0, 0, 6),
                                    arc=np.pi / 4)
    imgs = [scene.render(cam, gt[i]) for i in range(n)]
    # --- per-frame API (dispatch -> fetch -> bookkeep each frame) --------
    s = System(cfg)
    s.startup()
    est, times = [], []
    for i in range(n):
        t0 = time.perf_counter()
        pose = s.feed_monocular_frame(imgs[i], i / 20.0)
        times.append(time.perf_counter() - t0)
        est.append(pose)
    s.shutdown()
    tracked = [p is not None for p in est]
    idx = [i for i in range(n) if tracked[i]]
    ce = np.stack([-est[i][:3, :3].T @ est[i][:3, 3] for i in idx])
    cg = np.stack([-gt[i][:3, :3].T @ gt[i][:3, 3] for i in idx])
    ate = evaluate.ate_rmse(ce, cg, align="sim3")
    tt = np.array(times[5:])
    print(f"per-frame: tracked {sum(tracked)}/{n}; ATE(sim3) {ate:.4f} m; "
          f"median frame {np.median(tt)*1000:.1f} ms "
          f"({1.0/np.median(tt):.1f} fps via tunnel)", flush=True)
    assert sum(tracked) >= 0.9 * n - 2 and ate < 0.10

    # --- pipelined sequence feed (hides the tunnel RTT) ------------------
    # (shares the compiled TrackStep/frontend with the System above via the
    # .shared() caches, so no recompilation distorts the timing)
    s2 = System(cfg)
    s2.startup()
    out, ytimes = [], []
    t_last = time.perf_counter()
    for ts_pose in s2.feed_sequence(
            ((imgs[i], i / 20.0) for i in range(n)), kind="monocular"):
        now = time.perf_counter()
        ytimes.append(now - t_last)
        t_last = now
        out.append(ts_pose)
    s2.shutdown()
    tracked2 = [p is not None for _, p in out]
    idx2 = [i for i in range(n) if tracked2[i]]
    ce2 = np.stack([-out[i][1][:3, :3].T @ out[i][1][:3, 3] for i in idx2])
    cg2 = np.stack([-gt[i][:3, :3].T @ gt[i][:3, 3] for i in idx2])
    ate2 = evaluate.ate_rmse(ce2, cg2, align="sim3")
    yt = np.array(ytimes[5:])
    print(f"pipelined: tracked {sum(tracked2)}/{n}; ATE(sim3) {ate2:.4f} m; "
          f"median frame {np.median(yt)*1000:.1f} ms "
          f"({1.0/np.median(yt):.1f} fps via tunnel, "
          f"fused {s2._fused_frames})", flush=True)
    assert sum(tracked2) >= 0.9 * n - 2 and ate2 < 0.10
    print("SYSTEM TPU SMOKE PASS", flush=True)


if __name__ == "__main__":
    main()
