"""Stereo and RGBD end-to-end on the textured-plane scene.

Stereo/RGBD recover METRIC scale (unlike mono), so ATE is checked with SE3
alignment only — the strongest accuracy statement the harness makes.
"""
import numpy as np

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate

BASELINE = 0.2   # metres


def _make_config(setup, rows=320, cols=416):
    return Config.from_dict({
        "Camera": {
            "name": "synthetic-stereo", "setup": setup, "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 10,
            "focal_x_baseline": 350.0 * BASELINE,
            "depth_threshold": 30.0,
            "depthmap_factor": 1.0,
        },
        "Feature": {"max_num_keypts": 600, "num_levels": 4, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })


def _wall_poses(n=25, x_max=6.0):
    xs = np.linspace(0.0, x_max, n)
    return np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs])


def _right_pose(T_l):
    shift = np.eye(4)
    shift[0, 3] = -BASELINE
    return shift @ T_l


def _se3_ate(s, poses_gt):
    ts, poses, mask = s.tracked_poses()
    idx = np.where(mask)[0]
    est = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
    gt = np.stack([-poses_gt[i][:3, :3].T @ poses_gt[i][:3, 3] for i in idx])
    return evaluate.ate_rmse(est, gt, align="se3"), len(idx)


def test_stereo_e2e(rng):
    cfg = _make_config("stereo")
    cam = cfg.camera
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-4, 12), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    poses = _wall_poses()
    s = System(cfg)
    s.startup()
    tracked = 0
    for i in range(len(poses)):
        l_img = scene.render(cam, poses[i])
        r_img = scene.render(cam, _right_pose(poses[i]))
        p = s.feed_stereo_frame(l_img, r_img, i / 10.0)
        tracked += p is not None
    s.shutdown()
    assert tracked > 0.9 * len(poses), tracked
    ate, n = _se3_ate(s, poses)
    # metric SE3 ATE over a 6 m trajectory
    assert ate < 0.08, f"stereo SE3 ATE {ate:.3f} m over {n} frames"


def test_rgbd_e2e(rng):
    cfg = _make_config("rgbd")
    cam = cfg.camera
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-4, 12), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    poses = _wall_poses()
    s = System(cfg)
    s.startup()
    tracked = 0
    for i in range(len(poses)):
        img = scene.render(cam, poses[i])
        # ground-truth depth of the plane along each pixel ray (z-depth)
        T = poses[i]
        c = -T[:3, :3].T @ T[:3, 3]
        # plane z=7 in world; camera looks along +z: depth = (7 - c_z) under
        # this fronto-parallel trajectory (rotation ~ identity)
        depthmap = np.full((cam.rows, cam.cols), 7.0 - c[2], np.float32)
        p = s.feed_RGBD_frame(img, depthmap, i / 10.0)
        tracked += p is not None
    s.shutdown()
    assert tracked > 0.9 * len(poses), tracked
    ate, n = _se3_ate(s, poses)
    assert ate < 0.08, f"rgbd SE3 ATE {ate:.3f} m over {n} frames"
