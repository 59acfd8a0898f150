"""The fused single-program two-view bootstrap (initialize.two_view.
init_attempt) must make the SAME decisions as the original multi-call
ladder it replaced (kept as _initialize_two_view_unfused): same match set,
same model selection, same pose/points/inliers."""
import numpy as np
import jax.numpy as jnp
import jax.random as jr
import pytest

from openvslam_tpu.config import Config
from openvslam_tpu.data import Frame
from openvslam_tpu.initialize import two_view as TV
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic


def _make_frames(n_feats=900):
    cfg = Config.from_dict({
        "Camera": {
            "name": "init", "setup": "monocular", "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": 208.0, "cy": 160.0,
            "cols": 416, "rows": 320, "fps": 20,
        },
        "Feature": {"max_num_keypts": n_feats, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(4)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=900, center=(0, 0, 6), extent=(6, 4.5, 2.5),
        rows=cam.rows, cols=cam.cols,
    )
    p0 = synthetic.lookat_pose_cw((0, 0, 0), (0, 0, 6))
    p1 = synthetic.lookat_pose_cw((0.35, 0.05, 0), (0.1, 0, 6))
    s = System(cfg)
    frames = []
    for i, P in enumerate((p0, p1)):
        kp = s.frontend.extract(jnp.asarray(scene.render(cam, P)))
        frames.append(Frame.from_keypoints(i, i / 20.0, kp, s.cam))
    return s.cam, frames


def test_fused_matches_unfused_success():
    cam, frames = _make_frames()
    any_success = False
    for seed in (7, 11):
        key = jr.PRNGKey(seed)
        r_new = TV.initialize_two_view(key, frames[0], frames[1], cam)
        r_old = TV._initialize_two_view_unfused(key, frames[0], frames[1], cam)
        assert r_new.success == r_old.success
        assert r_new.num_matches == r_old.num_matches
        if r_new.success:
            any_success = True
            np.testing.assert_array_equal(r_new.idx1, r_old.idx1)
            np.testing.assert_array_equal(r_new.idx2, r_old.idx2)
            assert r_new.used_homography == r_old.used_homography
            np.testing.assert_allclose(r_new.T_21, r_old.T_21, atol=1e-4)
            np.testing.assert_allclose(r_new.points, r_old.points, atol=1e-3)
            np.testing.assert_array_equal(r_new.is_inlier, r_old.is_inlier)
    assert any_success, "bootstrap never succeeded — geometry too weak"


def test_fused_matches_unfused_failure():
    """Degenerate pair (identical views -> no parallax): both must refuse."""
    cam, frames = _make_frames()
    key = jr.PRNGKey(3)
    r_new = TV.initialize_two_view(key, frames[0], frames[0], cam)
    r_old = TV._initialize_two_view_unfused(key, frames[0], frames[0], cam)
    assert r_new.success == r_old.success == False  # noqa: E712
    assert r_new.num_matches == r_old.num_matches
