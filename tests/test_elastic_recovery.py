"""Elastic recovery (SURVEY.md §5.3): a session crashes mid-run; a new
session resumes from the last autosave snapshot, relocalizes against the
restored map, and CONTINUES MAPPING — the checkpoint/resume story that
replaces the reference's single-process assumption.
"""
import numpy as np
import pytest

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.module.tracking_module import TrackerState
from openvslam_tpu.utils import synthetic, evaluate


@pytest.fixture(scope="module")
def scene_and_poses():
    cfg = Config.from_dict({
        "Camera": {
            "name": "elastic", "setup": "monocular", "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": 208.0, "cy": 160.0,
            "cols": 416, "rows": 320, "fps": 20,
        },
        "Feature": {"max_num_keypts": 600, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(31)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 10), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 5.0, 34)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7))
                      for x in xs])
    return cfg, scene, poses


def test_crash_resume_continues_mapping(scene_and_poses, tmp_path):
    cfg, scene, poses = scene_and_poses
    cam = cfg.camera
    snap = str(tmp_path / "session.msg")

    # --- session A: map with autosave, then "crash" mid-sequence ---------
    a = System(cfg, vocab_path="default")
    a.startup()
    a.enable_autosave(snap, every_n_keyframes=1)
    for i in range(20):
        a.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
    t = getattr(a, "_autosave_thread", None)
    if t is not None:
        t.join(timeout=60)
    import os
    assert os.path.exists(snap), "no autosave snapshot written"
    kfs_a = len(a.map_db.valid_kf_ids())
    assert kfs_a >= 3
    # crash: no shutdown, object abandoned

    # --- session B: resume from the snapshot ------------------------------
    b = System(cfg, vocab_path="default")
    b.load_map_database(snap)
    b.startup()
    kfs_restored = len(b.map_db.valid_kf_ids())
    assert kfs_restored >= 2
    b.tracker.state = TrackerState.LOST   # resumed process knows no pose
    tracked = 0
    for i in range(14, 34):   # overlap the mapped region, then new ground
        p = b.feed_monocular_frame(scene.render(cam, poses[i]),
                                   100 + i / 20.0)
        tracked += p is not None
    b.shutdown()
    assert tracked >= 14, f"tracked {tracked}/20 after resume"
    # mapping CONTINUED: new keyframes/landmarks beyond the snapshot
    assert len(b.map_db.valid_kf_ids()) > kfs_restored, \
        "resume did not extend the map"

    # resumed trajectory is metrically consistent with session A's frame
    # poses over the overlap (same map gauge after relocalization)
    ts_a, pa, ma = a.tracked_poses()
    ts_b, pb, mb = b.tracked_poses()
    common = [(i, i - 14) for i in range(14, 20)]
    errs = []
    for ia, ib in common:
        if ma[ia] and mb[ib]:
            ca = -pa[ia][:3, :3].T @ pa[ia][:3, 3]
            cb = -pb[ib][:3, :3].T @ pb[ib][:3, 3]
            errs.append(np.linalg.norm(ca - cb))
    assert errs and float(np.median(errs)) < 0.15, errs
