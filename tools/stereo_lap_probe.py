"""Quick probe of the organic stereo-lap harness (test_stereo_loop's
fixture): prints loops closed + metric KF ATE for A/B diagnosis."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate

BASELINE = 0.25
rows, cols = 240, 320
cfg = Config.from_dict({
    "Camera": {"name": "synthetic-stereo", "setup": "stereo",
               "model": "perspective",
               "fx": 260.0, "fy": 260.0, "cx": cols / 2, "cy": rows / 2,
               "cols": cols, "rows": rows, "fps": 20,
               "focal_x_baseline": 260.0 * BASELINE,
               "depth_threshold": 40.0},
    "Feature": {"max_num_keypts": 500, "num_levels": 3, "scale_factor": 1.2},
    "LoopDetector": {"enabled": True, "min_continuity": 2},
})
cam = cfg.camera
rng = np.random.default_rng(11)
scene = synthetic.RoomSceneRenderer(rng, half=10.0, rows=rows, cols=cols,
                                    n_walls=8)
n_frames = 200
poses_gt = synthetic.lap_trajectory(n_frames, radius=6.0, laps=200 / 180)
shift = np.eye(4)
shift[0, 3] = -BASELINE
s = System(cfg, vocab_path="default")
s.startup()
tracked = []
for i in range(n_frames):
    l_img = scene.render(cam, poses_gt[i])
    r_img = scene.render(cam, shift @ poses_gt[i])
    pose = s.feed_stereo_frame(l_img, r_img, i / 20.0)
    tracked.append(pose is not None)
s.shutdown()
db = s.map_db
ids = db.valid_kf_ids()
ek = np.stack([-db.kf_pose_cw[k][:3, :3].T @ db.kf_pose_cw[k][:3, 3]
               for k in ids])
gk = np.stack([-poses_gt[f][:3, :3].T @ poses_gt[f][:3, 3]
               for f in db.kf_src_frame[ids]])
ate = evaluate.ate_rmse(ek, gk, align="se3")
print(f"PROBE loops={s.global_optimizer.num_loops_closed} "
      f"tracked={np.mean(tracked):.3f} kfs={len(ids)} "
      f"metricKF_ATE={ate:.4f}")
