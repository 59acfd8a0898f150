"""Monocular tracking with non-pinhole camera models (ref config 4): fisheye
(equidistant) and equirectangular.  The plane renderer ray-casts through each
model's own unprojection, so the rendered images carry the model's distortion;
the two-view initializer takes the essential-on-bearings path for these."""
import numpy as np

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate


def _run(cfg, rng, n=22, x_max=3.0):
    cam = cfg.camera
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-8, 12), y_range=(-7, 7), plane_z=6.0, res=50,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, x_max, n)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 6)) for x in xs])
    s = System(cfg)
    s.startup()
    tracked = 0
    for i in range(n):
        p = s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
        tracked += p is not None
    s.shutdown()
    # the fused one-dispatch TrackStep must carry non-pinhole models too
    # (VERDICT r2 next-#7): only init/lost frames may take the classic path
    assert s._track_step is not None and s._fused_frames > 0.5 * tracked, (
        s._fused_frames, tracked)
    ts, est_poses, mask = s.tracked_poses()
    idx = np.where(mask)[0]
    est = np.stack([-est_poses[i][:3, :3].T @ est_poses[i][:3, 3] for i in idx])
    gt = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
    ate = evaluate.ate_rmse(est, gt, align="sim3")
    return tracked, n, ate


def test_fisheye_tracking(rng):
    cfg = Config.from_dict({
        "Camera": {
            "name": "fisheye-synth", "setup": "monocular", "model": "fisheye",
            "fx": 280.0, "fy": 280.0, "cx": 208.0, "cy": 160.0,
            "k1": -0.02, "k2": 0.006, "k3": -0.002, "k4": 0.0005,
            "cols": 416, "rows": 320, "fps": 20,
        },
        "Feature": {"max_num_keypts": 600, "num_levels": 4, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    tracked, n, ate = _run(cfg, rng)
    assert tracked > 0.8 * n, f"tracked {tracked}/{n}"
    assert ate < 0.12, f"fisheye ATE {ate:.3f}"


def test_equirectangular_tracking(rng):
    cfg = Config.from_dict({
        "Camera": {
            "name": "equirect-synth", "setup": "monocular",
            "model": "equirectangular",
            "cols": 640, "rows": 320, "fps": 20,
        },
        "Feature": {"max_num_keypts": 800, "num_levels": 4, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    tracked, n, ate = _run(cfg, rng, n=24, x_max=3.0)
    # slow init: small parallax on the partial-sphere view
    assert tracked > 0.6 * n, f"tracked {tracked}/{n}"
    assert ate < 0.15, f"equirect ATE {ate:.3f}"
