"""Loop-closure machinery on organically built maps.

An artificial "drift injection" e2e is unphysical here: the tracker's
fallback matching and the relocalizer heal any fork against the still-present
pre-drift landmarks (verified experimentally — the healing IS correct
behavior).  Instead we drive each loop-closure stage on a real map built by
the full system:

1. out-and-back traversal of a textured wall -> healthy map, small ATE
2. ``loop_detector.validate`` on an (out-pass, back-pass) keyframe pair that
   observes the same wall section: the recovered Sim3 must equal the actual
   relative pose (scale ~ 1)
3. ``correct_loop`` + Sim3 pose graph after forcibly drifting the newest
   covisibility group: the map must snap back (ATE restored)
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
            "cols": cols, "rows": rows, "fps": 8,   # low fps -> denser keyframes
        },
        "Feature": {"max_num_keypts": n_feats, "num_levels": 4, "scale_factor": 1.2},
        "LoopDetector": {"enabled": True, "min_continuity": 2},
    })


@pytest.fixture(scope="module")
def wall_run():
    rng = np.random.default_rng(7)
    cfg = _make_config()
    cam = cfg.camera
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-4, 18), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs_out = np.linspace(0.0, 12.0, 36)
    out = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs_out])
    poses_gt = np.concatenate([out, out[::-1][1:]], 0)
    s = System(cfg, vocab_path="default")
    s.startup()
    ok = 0
    for i in range(len(poses_gt)):
        p = s.feed_monocular_frame(scene.render(cam, poses_gt[i]), i / 20.0)
        ok += p is not None
    s.shutdown()
    return s, poses_gt, ok


def _kf_ate(s, poses_gt):
    db = s.map_db
    ids = db.valid_kf_ids()
    est = np.stack([
        -db.kf_pose_cw[k][:3, :3].T @ db.kf_pose_cw[k][:3, 3] for k in ids
    ])
    gt = np.stack([
        -poses_gt[f][:3, :3].T @ poses_gt[f][:3, 3] for f in db.kf_src_frame[ids]
    ])
    return evaluate.ate_rmse(est, gt, align="sim3")


def test_wall_tracking_healthy(wall_run):
    s, poses_gt, ok = wall_run
    assert ok > 0.9 * len(poses_gt)
    assert _kf_ate(s, poses_gt) < 0.15            # 12 m span


def test_sim3_validation_on_real_pair(wall_run):
    s, poses_gt, _ = wall_run
    db = s.map_db
    go = s.global_optimizer
    ids = db.valid_kf_ids()
    src = db.kf_src_frame[ids]
    n_out = 36
    # pick an out-pass KF and the back-pass KF closest in viewpoint
    back = [(k, f) for k, f in zip(ids, src) if f >= n_out + 3]
    assert back, "no back-pass keyframes"
    kf_b, f_b = max(back, key=lambda t: t[1])
    # ground-truth position of that frame; find out-pass KF at same spot
    x_b = -poses_gt[f_b][:3, :3].T @ poses_gt[f_b][:3, 3]
    cands = [(k, f) for k, f in zip(ids, src) if f < n_out]
    kf_a, f_a = min(
        cands,
        key=lambda t: np.linalg.norm(
            (-poses_gt[t[1]][:3, :3].T @ poses_gt[t[1]][:3, 3]) - x_b
        ),
    )
    out = go.loop_detector.validate(int(kf_b), int(kf_a), min_inliers=20)
    assert out is not None, f"validation failed for KFs {kf_b}<->{kf_a}"
    R, t, sc, mk, mc, lms_k, lms_c = out
    # in a consistent map the validated Sim3 must equal the actual rel pose
    T_rel = db.kf_pose_cw[int(kf_b)] @ np.linalg.inv(db.kf_pose_cw[int(kf_a)])
    assert abs(sc - 1.0) < 0.1, sc
    assert np.linalg.norm(R - T_rel[:3, :3]) < 0.1
    assert np.linalg.norm(t - T_rel[:3, 3]) < 0.15


def test_loop_correction_on_two_session_fork(wall_run):
    """Build the honest loop topology: an independent second session maps the
    same start section in its OWN (offset, differently-scaled mono) frame; its
    map is absorbed as a disconnected duplicate; validate+correct must align
    it to the first session's frame."""
    s, poses_gt, _ = wall_run
    cfg = _make_config()
    cam = cfg.camera
    rng2 = np.random.default_rng(7)   # same seed -> same scene texture
    scene = synthetic.PlaneSceneRenderer(
        rng2, x_range=(-4, 18), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 4.0, 14)
    poses_b = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs])
    s2 = System(cfg, vocab_path=None)
    s2.startup()
    for i in range(len(poses_b)):
        s2.feed_monocular_frame(scene.render(cam, poses_b[i]), 100.0 + i / 20.0)
    s2.shutdown()
    assert s2.map_db.n_kfs >= 3

    db = s.map_db
    go = s.global_optimizer
    ate_before = _kf_ate(s, poses_gt)
    kf_map, lm_map = db.absorb(s2.map_db)
    group = sorted(kf_map.values())
    # the absorbed sub-map sits in its own frame: global consistency is broken
    kf_b = group[len(group) // 2]
    f_b = int(db.kf_src_frame[kf_b]) - 0   # session-B frame index (timestamp 100+)
    # nearest session-A keyframe by ground-truth viewpoint
    xs_b = xs[min(int(db.kf_src_frame[kf_b]), len(xs) - 1)]
    a_ids = [int(k) for k in db.valid_kf_ids() if int(k) not in set(group)]
    kf_a = min(
        a_ids,
        key=lambda k: abs(
            (-poses_gt[int(db.kf_src_frame[k])][:3, :3].T
             @ poses_gt[int(db.kf_src_frame[k])][:3, 3])[0] - xs_b
        ),
    )
    out = go.loop_detector.validate(kf_b, kf_a, min_inliers=20)
    assert out is not None, "Sim3 validation failed on the two-session pair"
    R, t, sc, mk, mc, lms_k, lms_c = out
    go.correct_loop(kf_b, kf_a, (R, t, sc), lms_k, lms_c, group=group)

    # after correction the absorbed KFs must agree with session-A ground truth
    est = np.stack([
        -db.kf_pose_cw[k][:3, :3].T @ db.kf_pose_cw[k][:3, 3] for k in group
    ])
    gt = np.stack([
        -poses_b[min(int(db.kf_src_frame[k]), len(xs) - 1)][:3, :3].T
        @ poses_b[min(int(db.kf_src_frame[k]), len(xs) - 1)][:3, 3]
        for k in group
    ])
    # align session A's map to GT first (mono scale), then measure B's error
    a_est = np.stack([
        -db.kf_pose_cw[k][:3, :3].T @ db.kf_pose_cw[k][:3, 3] for k in a_ids
    ])
    a_gt = np.stack([
        -poses_gt[int(db.kf_src_frame[k])][:3, :3].T
        @ poses_gt[int(db.kf_src_frame[k])][:3, 3] for k in a_ids
    ])
    sA, RA, tA = evaluate.umeyama_alignment(a_est, a_gt, with_scale=True)
    b_aligned = (sA * (RA @ est.T)).T + tA
    err = np.linalg.norm(b_aligned - gt, axis=-1)
    assert np.median(err) < 0.3, err
