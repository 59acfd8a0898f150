import jax.numpy as jnp
import numpy as np

from openvslam_tpu.camera import Perspective
from openvslam_tpu.optimize.pose_optimizer import make_pose_optimizer
from openvslam_tpu.ops import se3
from openvslam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.smoke


def _setup(rng, n=200):
    cam = Perspective.create(fx=500, fy=500, cx=320, cy=240, cols=640, rows=480)
    pts = synthetic.landmark_cloud(rng, n, center=(0, 0, 6), extent=(4, 3, 2))
    T_gt = synthetic.lookat_pose_cw((0.3, -0.2, 0.5), (0, 0, 6))
    pc = (T_gt[:3, :3] @ pts.T).T + T_gt[:3, 3]
    uv, _, _ = cam.project(jnp.asarray(pc, jnp.float32))
    return cam, pts, T_gt, np.asarray(uv).copy()


def test_pose_recovery(rng):
    cam, pts, T_gt, uv = _setup(rng)
    uv += rng.standard_normal(uv.shape) * 0.5
    opt = make_pose_optimizer(cam)
    # perturb the pose
    xi = np.array([0.03, -0.02, 0.04, 0.1, -0.08, 0.05], np.float32)
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ T_gt
    res = opt(
        jnp.asarray(T0, jnp.float32), jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv, jnp.float32), jnp.ones(len(pts), jnp.float32),
        jnp.ones(len(pts), bool),
    )
    T_est = np.asarray(res.T_cw)
    assert np.linalg.norm(T_est[:3, :3] - T_gt[:3, :3]) < 5e-3
    assert np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]) < 1e-2
    assert int(res.num_inliers) > 190


def test_pose_outlier_rejection(rng):
    cam, pts, T_gt, uv = _setup(rng)
    uv += rng.standard_normal(uv.shape) * 0.5
    out = rng.choice(len(pts), 40, replace=False)
    uv[out] += (rng.random((40, 2)) - 0.5) * 100 + 20
    opt = make_pose_optimizer(cam)
    xi = np.array([0.02, 0.01, -0.02, 0.05, 0.05, -0.05], np.float32)
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ T_gt
    res = opt(
        jnp.asarray(T0, jnp.float32), jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv, jnp.float32), jnp.ones(len(pts), jnp.float32),
        jnp.ones(len(pts), bool),
    )
    T_est = np.asarray(res.T_cw)
    inl = np.asarray(res.inliers)
    assert np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]) < 2e-2
    # outliers mostly rejected, inliers mostly kept
    assert inl[out].mean() < 0.2
    gt_in = np.ones(len(pts), bool)
    gt_in[out] = False
    assert inl[gt_in].mean() > 0.9


def test_pose_respects_mask(rng):
    cam, pts, T_gt, uv = _setup(rng)
    # corrupt second half entirely but mask it off
    uv[100:] = 0.0
    mask = np.zeros(len(pts), bool)
    mask[:100] = True
    opt = make_pose_optimizer(cam)
    xi = np.array([0.01, 0.01, 0.0, 0.03, -0.03, 0.02], np.float32)
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ T_gt
    res = opt(
        jnp.asarray(T0, jnp.float32), jnp.asarray(pts, jnp.float32),
        jnp.asarray(uv, jnp.float32), jnp.ones(len(pts), jnp.float32),
        jnp.asarray(mask),
    )
    T_est = np.asarray(res.T_cw)
    assert np.linalg.norm(T_est[:3, 3] - T_gt[:3, 3]) < 1e-2
    assert int(res.num_inliers) <= 100
