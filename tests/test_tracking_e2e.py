"""End-to-end monocular SLAM on a rendered synthetic sequence with known
ground truth — the integration test the reference lacked (SURVEY.md §4)."""
import numpy as np
import pytest

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate


def _make_config(rows=320, cols=416, n_feats=600, **feature_extra):
    return Config.from_dict({
        "Camera": {
            "name": "synthetic", "setup": "monocular", "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": n_feats, "num_levels": 4,
                    "scale_factor": 1.2, **feature_extra},
        "LoopDetector": {"enabled": False},
    })


@pytest.fixture(scope="module")
def slam_run():
    cfg = _make_config()
    cam = cfg.camera
    rng = np.random.default_rng(11)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=700, center=(0, 0, 6), extent=(6, 4.5, 2.5),
        rows=cam.rows, cols=cam.cols,
    )
    n_frames = 40
    poses_gt = synthetic.orbit_trajectory(
        n_frames, radius=2.5, target=(0, 0, 6), arc=np.pi / 4
    )
    sys_ = System(cfg)
    sys_.startup()
    tracked = []
    for i in range(n_frames):
        img = scene.render(cam, poses_gt[i])
        pose = sys_.feed_monocular_frame(img, i / 20.0)
        tracked.append(pose is not None)
    sys_.shutdown()
    return sys_, poses_gt, np.array(tracked)


def test_initializes_and_tracks(slam_run):
    sys_, poses_gt, tracked = slam_run
    assert tracked.any(), "never initialized"
    first = int(np.argmax(tracked))
    assert first < 15, f"initialized too late: {first}"
    # once initialized, tracks nearly every frame
    assert tracked[first:].mean() > 0.9, tracked


def test_map_grows(slam_run):
    sys_, _, _ = slam_run
    assert sys_.map_db.n_kfs >= 2
    assert len(sys_.map_db.valid_lm_ids()) > 100


def test_ate_small(slam_run):
    sys_, poses_gt, tracked = slam_run
    ts, poses, mask = sys_.tracked_poses()
    est_centers = []
    gt_centers = []
    for i in np.where(mask)[0]:
        T = poses[i]
        est_centers.append(-T[:3, :3].T @ T[:3, 3])
        G = poses_gt[i]
        gt_centers.append(-G[:3, :3].T @ G[:3, 3])
    est = np.stack(est_centers)
    gt = np.stack(gt_centers)
    ate = evaluate.ate_rmse(est, gt, align="sim3")
    # gt trajectory spans ~2m; mono Sim3-aligned ATE should be centimeters
    assert ate < 0.08, f"ATE {ate:.3f} m"


def test_trajectory_io(slam_run, tmp_path):
    sys_, _, _ = slam_run
    p = tmp_path / "traj.txt"
    sys_.save_frame_trajectory(str(p), "TUM")
    assert p.exists() and len(p.read_text().splitlines()) > 10
    p2 = tmp_path / "kf.txt"
    sys_.save_keyframe_trajectory(str(p2), "KITTI")
    assert p2.exists()
