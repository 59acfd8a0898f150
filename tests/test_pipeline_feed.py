"""System.feed_sequence — software-pipelined feeding (dispatch frame N+1's
fused device step before frame N's bookkeeping).  The pipelined run must
match the per-frame API's tracking quality on the same synthetic sequence:
the only semantic difference is the one-frame-stale map seen by the device
step (the contract async mapping already grants) and the two-step motion
extrapolation, neither of which may cost tracked frames or accuracy class.
"""
import numpy as np
import pytest

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate


def _make_config(rows=320, cols=416, n_feats=600):
    return Config.from_dict({
        "Camera": {
            "name": "synthetic", "setup": "monocular", "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": n_feats, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })


def _render_sequence(cfg, n_frames=40, seed=11):
    cam = cfg.camera
    rng = np.random.default_rng(seed)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=700, center=(0, 0, 6), extent=(6, 4.5, 2.5),
        rows=cam.rows, cols=cam.cols,
    )
    poses_gt = synthetic.orbit_trajectory(
        n_frames, radius=2.5, target=(0, 0, 6), arc=np.pi / 4
    )
    images = [scene.render(cam, poses_gt[i]) for i in range(n_frames)]
    return images, poses_gt


def _sim3_ate(sys_, poses_gt):
    ts, poses, mask = sys_.tracked_poses()
    est, gt = [], []
    for i in np.where(mask)[0]:
        T, G = poses[i], poses_gt[i]
        est.append(-T[:3, :3].T @ T[:3, 3])
        gt.append(-G[:3, :3].T @ G[:3, 3])
    return evaluate.ate_rmse(np.stack(est), np.stack(gt), align="sim3")


@pytest.fixture(scope="module")
def runs():
    cfg = _make_config()
    images, poses_gt = _render_sequence(cfg)

    sys_ref = System(cfg)
    sys_ref.startup()
    for i, img in enumerate(images):
        sys_ref.feed_monocular_frame(img, i / 20.0)
    sys_ref.shutdown()

    sys_pipe = System(cfg)
    sys_pipe.startup()
    out = list(sys_pipe.feed_sequence(
        ((img, i / 20.0) for i, img in enumerate(images)), kind="monocular"))
    sys_pipe.shutdown()
    return sys_ref, sys_pipe, out, poses_gt, len(images)


def test_yields_every_frame_in_order(runs):
    _, _, out, _, n = runs
    assert len(out) == n
    ts = [t for t, _ in out]
    assert ts == sorted(ts)
    np.testing.assert_allclose(ts, np.arange(n) / 20.0)


def test_pipelined_uses_fused_path(runs):
    _, sys_pipe, out, _, n = runs
    # the common path must actually pipeline (not silently fall back)
    assert sys_pipe._fused_frames > 0.7 * n, sys_pipe.stats()
    tracked = sum(p is not None for _, p in out)
    assert tracked > 0.85 * n, f"tracked {tracked}/{n}"


def test_quality_matches_per_frame_api(runs):
    sys_ref, sys_pipe, out, poses_gt, n = runs
    tracked_ref = sum(p is not None for _, p in sys_ref.trajectory)
    tracked_pipe = sum(p is not None for _, p in out)
    assert tracked_pipe >= tracked_ref - 3, (tracked_pipe, tracked_ref)
    ate_ref = _sim3_ate(sys_ref, poses_gt)
    ate_pipe = _sim3_ate(sys_pipe, poses_gt)
    # same accuracy class: centimeters on a ~2 m trajectory
    assert ate_pipe < max(2.0 * ate_ref, 0.08), (ate_pipe, ate_ref)


def test_trajectory_state_consistent(runs):
    _, sys_pipe, out, _, n = runs
    # System.trajectory mirrors the yielded stream
    assert len(sys_pipe.trajectory) == n
    for (t_y, p_y), (t_s, p_s) in zip(out, sys_pipe.trajectory):
        assert t_y == t_s
        assert (p_y is None) == (p_s is None)
        if p_y is not None:
            np.testing.assert_allclose(p_y, p_s)


def test_depth2_pipeline_quality():
    """depth=2 keeps two frames in flight (three-frame-stale map, lead-3
    prediction) — tracking quality must stay in the same class."""
    cfg = _make_config()
    images, poses_gt = _render_sequence(cfg)
    s = System(cfg)
    s.startup()
    out = list(s.feed_sequence(
        ((img, i / 20.0) for i, img in enumerate(images)), depth=2))
    s.shutdown()
    n = len(images)
    assert len(out) == n
    tracked = sum(p is not None for _, p in out)
    assert tracked > 0.85 * n, f"tracked {tracked}/{n}"
    assert s._fused_frames > 0.7 * n
    ate = _sim3_ate(s, poses_gt)
    # 0.12: the r4 rotation-damped windowed prediction (NOTES.md) trades a
    # little gentle-orbit precision (measured 0.111 m here, was <0.08 with
    # the raw lead-N displacement) for stability under sustained yaw
    # (rotating-lap depth-3 ATE 1.67 -> 0.35 m) — same accuracy class.
    # Margin sits just above the measured value so a further regression on
    # this path fails loudly (r4 advisor: 0.15 hid ~35% headroom); the
    # rotating-lap side of the trade-off is pinned by test_predict_pose's
    # rotating-stereo-lap thresholds.
    assert ate < 0.12, f"depth-2 ATE {ate:.3f} m"


def test_rgbd_pipelined():
    """feed_sequence kind='rgbd' on the fronto-parallel plane scene (the
    same setup as test_stereo_rgbd_e2e): metric SE3 ATE, most frames fused."""
    cfg = Config.from_dict({
        "Camera": {
            "name": "synthetic", "setup": "rgbd", "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": 208.0, "cy": 160.0,
            "cols": 416, "rows": 320, "fps": 10,
            "focal_x_baseline": 350.0 * 0.1, "depth_threshold": 30.0,
            "depthmap_factor": 1.0,
        },
        "Feature": {"max_num_keypts": 600, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(5)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-4, 12), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 6.0, 30)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7))
                      for x in xs])

    def items():
        for i in range(len(poses)):
            img = scene.render(cam, poses[i])
            c = -poses[i][:3, :3].T @ poses[i][:3, 3]
            depthmap = np.full((cam.rows, cam.cols), 7.0 - c[2], np.float32)
            yield img, depthmap, i / 10.0

    s = System(cfg)
    s.startup()
    out = list(s.feed_sequence(items(), kind="rgbd"))
    s.shutdown()
    tracked = sum(p is not None for _, p in out)
    assert tracked > 0.9 * len(poses), tracked
    assert s._fused_frames > 0.6 * len(poses)
    idx = [i for i, (_, p) in enumerate(out) if p is not None]
    est = np.stack([-out[i][1][:3, :3].T @ out[i][1][:3, 3] for i in idx])
    gt = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
    ate = evaluate.ate_rmse(est, gt, align="se3")
    assert ate < 0.08, f"rgbd pipelined SE3 ATE {ate:.3f} m"


def test_pipeline_survives_lost_and_reinit():
    """Blank frames mid-sequence force the Lost path: the pipeline must
    drain, fall back to the classic ladder, and keep yielding in order."""
    cfg = _make_config()
    images, poses_gt = _render_sequence(cfg, n_frames=30)
    blank = np.zeros_like(images[0])
    seq = images[:18] + [blank, blank, blank] + images[18:]
    sys_ = System(cfg)
    sys_.startup()
    out = list(sys_.feed_sequence(
        ((img, i / 20.0) for i, img in enumerate(seq)), kind="monocular"))
    sys_.shutdown()
    assert len(out) == len(seq)
    # blanks cannot be tracked
    for t, p in out[18:21]:
        assert p is None
    # tracked again before or shortly after the blanks (reloc or reinit)
    assert any(p is not None for _, p in out[:18])
