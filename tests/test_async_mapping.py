"""Async mapping pipeline (ref three-thread contract): tracking proceeds while
the mapping stage runs on a worker; results match the synchronous mode."""
import numpy as np

from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic, evaluate


def _run(async_mapping, rng_seed=7, n=28):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    cfg = _make_config()
    cam = cfg.camera
    rng = np.random.default_rng(rng_seed)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 12), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 6.0, n)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs])
    s = System(cfg, async_mapping=async_mapping)
    s.startup()
    tracked = 0
    for i in range(n):
        p = s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
        tracked += p is not None
    s.shutdown()
    ts, est_poses, mask = s.tracked_poses()
    idx = np.where(mask)[0]
    est = np.stack([-est_poses[i][:3, :3].T @ est_poses[i][:3, 3] for i in idx])
    gt = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
    return tracked, n, evaluate.ate_rmse(est, gt, align="sim3"), s


def test_async_mapping_tracks_and_converges():
    tracked, n, ate, s = _run(async_mapping=True)
    assert tracked > 0.85 * n, tracked
    assert ate < 0.12, ate
    assert s.map_db.n_kfs >= 3
    # worker drained at shutdown
    assert s._tracker_mapper.idle
