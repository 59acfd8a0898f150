"""Long-sequence city-circuit SLAM (the KITTI-00-class correctness test,
VERDICT r2 next-#1): the full System drives a rendered street circuit that
revisits its start; the loop must close organically and the map must stay
metrically consistent.  Small-course variant of tools/city_bench.py sized
for CI (the 4,000-frame / 1 km run is the benchmark, not a test).
"""
import numpy as np
import pytest

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import evaluate, synthetic

pytestmark = pytest.mark.slow

BASELINE_M = 0.5


@pytest.fixture(scope="module")
def city_run():
    rows, cols = 240, 320
    cfg = Config.from_dict({
        "Camera": {"name": "city-stereo", "setup": "stereo",
                   "model": "perspective",
                   "fx": 260.0, "fy": 260.0, "cx": cols / 2, "cy": rows / 2,
                   "cols": cols, "rows": rows, "fps": 10,
                   "focal_x_baseline": 260.0 * BASELINE_M,
                   "depth_threshold": 40.0},
        "Feature": {"max_num_keypts": 500, "num_levels": 3,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": True, "min_continuity": 2},
    })
    cam = cfg.camera
    rng = np.random.default_rng(7)
    course = synthetic.RoundedRectCourse(straight_x=60, straight_z=60,
                                         corner_r=12)
    scene = synthetic.CityCourseRenderer(rng, course, street_half_w=4.0,
                                         seg_len=8.0)
    n = 700                                   # ~0.50 m/frame, 1.1 laps
    poses_gt = synthetic.course_trajectory(course, n, laps=1.1)
    shift = np.eye(4)
    shift[0, 3] = -BASELINE_M
    s = System(cfg, vocab_path="default")
    s.startup()
    tracked = []
    for i in range(n):
        l_img = scene.render(cam, poses_gt[i], ss=2)
        r_img = scene.render(cam, shift @ poses_gt[i], ss=2)
        pose = s.feed_stereo_frame(l_img, r_img, i / 10.0)
        tracked.append(pose is not None)
    s.shutdown()
    return s, poses_gt, np.array(tracked)


def test_city_tracks_throughout(city_run):
    s, poses_gt, tracked = city_run
    assert tracked[5:].mean() > 0.9, tracked.mean()


def test_city_loop_closes(city_run):
    s, *_ = city_run
    assert s.global_optimizer.num_loops_closed >= 1
    db = s.map_db
    assert any(db.loop_edges[int(k)] for k in db.valid_kf_ids())


def test_city_metric_consistency(city_run):
    """SE3-aligned (no scale freedom) keyframe ATE after loop closure,
    over the ~360 m driven circuit."""
    s, poses_gt, tracked = city_run
    db = s.map_db
    ids = db.valid_kf_ids()
    ek = np.stack([-db.kf_pose_cw[k][:3, :3].T @ db.kf_pose_cw[k][:3, 3]
                   for k in ids])
    gk = np.stack([-poses_gt[f][:3, :3].T @ poses_gt[f][:3, 3]
                   for f in db.kf_src_frame[ids]])
    ate = evaluate.ate_rmse(ek, gk, align="se3")
    assert ate < 2.0, f"metric KF ATE {ate:.2f} m over the 350 m circuit"


def test_city_no_unexplained_overflow(city_run):
    """Capacity planning (SURVEY §7 hard part 1): the run must not silently
    drop BA observations; local-map cap overflow is allowed but counted."""
    s, *_ = city_run
    ov = s.stats()["overflow"]
    assert ov.get("ba_obs", 0) == 0, ov
