"""Pipelined-feed depth sweep on a ROTATING trajectory (r3 limitation:
depth>=2 degraded stereo room-lap ATE 0.08 -> 1.67 m at 2 deg/frame).

Runs the stereo room lap through System.feed_sequence at depths 1/2/3 and
reports tracked fraction, fused fraction, SE3 ATE, and the
prediction-diagnostic counters — the harness for validating the
rotation-stable prediction work.

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/depth_sweep.py [--frames 100]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_depth(depth: int, n_frames: int, kind: str = "stereo"):
    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic, evaluate

    rows, cols = 240, 320
    BASELINE = 0.12
    cam_d = {
        "name": "synthetic", "setup": kind, "model": "perspective",
        "fx": 260.0, "fy": 260.0, "cx": cols / 2, "cy": rows / 2,
        "cols": cols, "rows": rows, "fps": 20,
    }
    if kind == "stereo":
        cam_d["focal_x_baseline"] = 260.0 * BASELINE
        cam_d["depth_threshold"] = 40.0
    cfg = Config.from_dict({
        "Camera": cam_d,
        "Feature": {"max_num_keypts": 500, "num_levels": 3,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(11)
    scene = synthetic.RoomSceneRenderer(rng, half=10.0, rows=rows, cols=cols,
                                        n_walls=8)
    poses_gt = synthetic.lap_trajectory(n_frames, radius=6.0,
                                        laps=n_frames / 180)
    shift = np.eye(4)
    shift[0, 3] = -BASELINE

    def items():
        for i in range(n_frames):
            l_img = scene.render(cam, poses_gt[i])
            if kind == "stereo":
                r_img = scene.render(cam, shift @ poses_gt[i])
                yield l_img, r_img, i / 20.0
            else:
                yield l_img, i / 20.0

    s = System(cfg)
    s.startup()
    out = list(s.feed_sequence(items(), kind=kind, depth=depth))
    s.shutdown()
    idx = [i for i, (_, p) in enumerate(out) if p is not None]
    est = np.stack([-out[i][1][:3, :3].T @ out[i][1][:3, 3] for i in idx]) \
        if idx else np.zeros((0, 3))
    gt = np.stack([-poses_gt[i][:3, :3].T @ poses_gt[i][:3, 3] for i in idx]) \
        if idx else np.zeros((0, 3))
    align = "se3" if kind == "stereo" else "sim3"
    ate = float(evaluate.ate_rmse(est, gt, align=align)) if len(idx) > 3 \
        else float("nan")
    return {
        "depth": depth,
        "tracked": len(idx) / n_frames,
        "fused_frac": s._fused_frames / n_frames,
        f"ate_{align}_m": round(ate, 4),
        "pred_hist_misses": s.tracker.pred_hist_misses,
        "keyframes": s.map_db.n_kfs,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--kind", default="stereo",
                    choices=["stereo", "monocular"])
    ap.add_argument("--depths", default="1,2,3")
    args = ap.parse_args()
    for d in [int(x) for x in args.depths.split(",")]:
        print(run_depth(d, args.frames, args.kind), flush=True)


if __name__ == "__main__":
    main()
