"""Tiny end-to-end smoke: 20-frame stereo run at small shapes.  Stereo
initializes on frame one (no two-view bootstrap wait), so this exercises
frontend -> tracking -> keyframes -> triangulation -> local BA in well
under a minute on 2 CPU cores — the `-m smoke` lane's pipeline gate."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate

BASELINE = 0.12


def test_stereo_smoke_e2e():
    rows, cols = 192, 256
    cfg = Config.from_dict({
        "Camera": {
            "name": "synthetic", "setup": "stereo", "model": "perspective",
            "fx": 210.0, "fy": 210.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 10,
            "focal_x_baseline": 210.0 * BASELINE, "depth_threshold": 40.0,
        },
        "Feature": {"max_num_keypts": 300, "num_levels": 3,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(5)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-4, 10), y_range=(-4, 4), plane_z=7.0,
        rows=rows, cols=cols)
    n = 20
    xs = np.linspace(0.0, 3.0, n)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7))
                      for x in xs])
    shift = np.eye(4)
    shift[0, 3] = -BASELINE
    s = System(cfg)
    s.startup()
    tracked = []
    for i in range(n):
        l_img = scene.render(cam, poses[i])
        r_img = scene.render(cam, shift @ poses[i])
        tracked.append(s.feed_stereo_frame(l_img, r_img, i / 10.0)
                       is not None)
    s.shutdown()
    assert sum(tracked) >= 0.9 * n, tracked
    assert s.map_db.n_kfs >= 2
    assert len(s.map_db.valid_lm_ids()) > 50
    ts, est, mask = s.tracked_poses()
    e = np.stack([-est[i][:3, :3].T @ est[i][:3, 3]
                  for i in np.where(mask)[0]])
    g = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3]
                  for i in np.where(mask)[0]])
    ate = evaluate.ate_rmse(e, g, align="se3")
    assert ate < 0.1, f"smoke stereo SE3 ATE {ate:.3f} m"
