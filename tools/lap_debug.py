"""Sustained-panning repro (NOTES.md weakness #1): camera circling inside an
n-gon room looking outward, ~2 deg/frame.  Instruments per-frame: tracked?,
num_tracked inliers, local-map size, KF insertions, landmark counts.

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/lap_debug.py [n_frames] [laps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 90
    laps = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    loop_on = len(sys.argv) > 3 and sys.argv[3] == "loop"

    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic, evaluate

    rows, cols = 320, 416
    cfg = Config.from_dict({
        "Camera": {
            "name": "synthetic", "setup": "monocular", "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": 600, "num_levels": 4, "scale_factor": 1.2},
        "LoopDetector": {"enabled": loop_on, "min_continuity": 2},
    })
    cam = cfg.camera
    rng = np.random.default_rng(7)
    scene = synthetic.RoomSceneRenderer(rng, half=10.0, rows=rows, cols=cols,
                                        n_walls=8)
    poses_gt = synthetic.lap_trajectory(n_frames, radius=6.0, laps=laps)
    deg_per_frame = 360.0 * laps / n_frames
    print(f"{n_frames} frames, {laps} laps -> {deg_per_frame:.2f} deg/frame")

    sys_ = System(cfg)
    sys_.startup()
    tr = sys_.tracker
    db = sys_.map_db
    tracked = []
    est = {}
    for i in range(n_frames):
        img = scene.render(cam, poses_gt[i])
        n_kfs_before = db.n_kfs
        pose = sys_.feed_monocular_frame(img, i / 20.0)
        tracked.append(pose is not None)
        if pose is not None:
            est[i] = pose
        kf_mark = "KF" if db.n_kfs > n_kfs_before else "  "
        cache = tr._lm_cache
        lm_local = cache["n"] if cache else 0
        loops = 0 if sys_.global_optimizer is None else \
            sys_.global_optimizer.num_loops_closed
        print(f"f{i:3d} {kf_mark} tracked={pose is not None!s:5} "
              f"inl={tr.num_tracked:4d} state={tr.state.name:15s} "
              f"localmap={lm_local:4d} kfs={db.n_kfs:3d} "
              f"lms={len(db.valid_lm_ids()):5d} loops={loops}")
    sys_.shutdown()
    tracked = np.array(tracked)
    print(f"\ntracked {tracked.sum()}/{n_frames}")
    if tracked.sum() > 5:
        idx = sorted(est.keys())
        e = np.stack([-est[i][:3, :3].T @ est[i][:3, 3] for i in idx])
        g = np.stack([-poses_gt[i][:3, :3].T @ poses_gt[i][:3, 3] for i in idx])
        ate = evaluate.ate_rmse(e, g, align="sim3")
        print(f"ATE(sim3) over tracked = {ate:.3f} m")


if __name__ == "__main__":
    main()
