"""Sustained-panning regression (r1 weakness #1): a camera sweeping at
~2 deg/frame inside an n-gon room must keep tracking.  The failure mode was
KF-cadence starvation of the forward FOV edge: inliers burst after each KF,
decay as landmarks exit the trailing edge, and the 0.9-reliable-ratio rule
alone inserts the next KF only at the brink of loss (NOTES.md r1).  The
decay-based cond_d in TrackingModule._new_keyframe_needed fixes it."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate


@pytest.fixture(scope="module")
def lap_run():
    rows, cols = 240, 320
    cfg = Config.from_dict({
        "Camera": {
            "name": "synthetic", "setup": "monocular", "model": "perspective",
            "fx": 260.0, "fy": 260.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": 500, "num_levels": 3, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(7)
    scene = synthetic.RoomSceneRenderer(rng, half=10.0, rows=rows, cols=cols,
                                        n_walls=8)
    n_frames = 40
    poses_gt = synthetic.lap_trajectory(n_frames, radius=6.0, laps=40 / 180)
    s = System(cfg)
    s.startup()
    tracked = []
    est = {}
    for i in range(n_frames):
        pose = s.feed_monocular_frame(scene.render(cam, poses_gt[i]), i / 20.0)
        tracked.append(pose is not None)
        if pose is not None:
            est[i] = pose
    s.shutdown()
    return s, poses_gt, np.array(tracked), est


def test_tracks_through_sustained_panning(lap_run):
    s, poses_gt, tracked, est = lap_run
    first = int(np.argmax(tracked))
    assert first < 10
    frac = tracked[first:].mean()
    assert frac > 0.9, f"only {frac:.0%} tracked under panning"


def test_panning_ate(lap_run):
    s, poses_gt, tracked, est = lap_run
    idx = sorted(est.keys())
    e = np.stack([-est[i][:3, :3].T @ est[i][:3, 3] for i in idx])
    g = np.stack([-poses_gt[i][:3, :3].T @ poses_gt[i][:3, 3] for i in idx])
    ate = evaluate.ate_rmse(e, g, align="sim3")
    assert ate < 0.25, f"ATE {ate:.3f} m over a {2 * np.pi * 6 * 40 / 180:.1f} m arc"


def test_decay_rule_fired(lap_run):
    """The scenario must actually exercise cond_d: KFs denser than the
    20-frame interval rule alone would produce."""
    s, *_ = lap_run
    assert s.map_db.n_kfs >= 5
