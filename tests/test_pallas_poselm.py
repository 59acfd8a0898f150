"""Fused pose-LM kernel vs the autodiff XLA core.

Three layers: (1) the analytic-Jacobian XLA schedule (the kernel body run
as plain jnp) must agree with make_pose_optimizer (same LM decisions, pose
to float tolerance); (2) the Pallas kernel in interpreter mode must equal
the analytic XLA schedule; (3) compiled-kernel equivalence on the real
backend is checked by docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openvslam_tpu.camera import Perspective
from openvslam_tpu.optimize.pose_optimizer import make_pose_optimizer
from openvslam_tpu.ops import se3
from openvslam_tpu.ops.pallas.pose_lm_kernel import (
    pose_lm_pallas, pose_lm_xla_reference)
from openvslam_tpu.optimize import residuals as R
from openvslam_tpu.utils import synthetic


def _cam():
    return Perspective.create(fx=500, fy=500, cx=320, cy=240,
                              cols=640, rows=480, focal_x_baseline=50.0)


def _params(cam, stereo):
    return dict(fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
                cy=float(cam.cy), fxb=float(cam.focal_x_baseline),
                chi2_thr=R.CHI2_3D if stereo else R.CHI2_2D)


def _problem(rng, n=200, stereo=False, outliers=40, mask_off=0):
    cam = _cam()
    pts = synthetic.landmark_cloud(rng, n, center=(0, 0, 6), extent=(4, 3, 2))
    T_gt = synthetic.lookat_pose_cw((0.3, -0.2, 0.5), (0, 0, 6))
    pc = (T_gt[:3, :3] @ pts.T).T + T_gt[:3, 3]
    uv, depth, _ = cam.project(jnp.asarray(pc, jnp.float32))
    uv = np.asarray(uv) + rng.standard_normal((n, 2)) * 0.5
    if stereo:
        ur = uv[:, 0] - float(cam.focal_x_baseline) / np.maximum(
            np.asarray(depth), 1e-6)
        ur[rng.random(n) < 0.3] = -1.0          # mixed mono observations
        obs = np.concatenate([uv, ur[:, None]], 1)
    else:
        obs = np.concatenate([uv, np.full((n, 1), -1.0)], 1)
    if outliers:
        out = rng.choice(n, outliers, replace=False)
        obs[out, :2] += (rng.random((outliers, 2)) - 0.5) * 100 + 20
    mask = np.ones(n, bool)
    if mask_off:
        mask[rng.choice(n, mask_off, replace=False)] = False
    xi = np.array([0.03, -0.02, 0.04, 0.1, -0.08, 0.05], np.float32)
    T0 = np.asarray(se3.se3_exp(jnp.asarray(xi))) @ T_gt
    sig = (1.2 ** rng.integers(0, 4, n)).astype(np.float32) ** 2
    return (cam, T_gt, jnp.asarray(T0, jnp.float32),
            jnp.asarray(pts, jnp.float32), jnp.asarray(obs, jnp.float32),
            jnp.asarray(sig), jnp.asarray(mask))


@pytest.mark.parametrize("stereo", [False, True])
def test_analytic_schedule_matches_autodiff_core(rng, stereo):
    cam, T_gt, T0, pts, obs, sig, mask = _problem(rng, stereo=stereo)
    core = make_pose_optimizer(cam, stereo=stereo)
    obs_core = obs if stereo else obs[:, :2]
    res = core(T0, pts, obs_core, sig, mask)
    T_a, inl_a, n_a, c2_a = pose_lm_xla_reference(
        T0, pts, obs, sig, mask, **_params(cam, stereo))
    # same optimum to float tolerance (same math, different J derivation)
    assert np.linalg.norm(np.asarray(T_a) - np.asarray(res.T_cw)) < 1e-3, (
        np.asarray(T_a) - np.asarray(res.T_cw))
    agree = (np.asarray(inl_a) == np.asarray(res.inliers)).mean()
    assert agree > 0.98, agree
    # and both recover the ground truth
    assert np.linalg.norm(np.asarray(T_a)[:3, 3] - T_gt[:3, 3]) < 2e-2


@pytest.mark.parametrize("stereo", [False, True])
def test_pallas_kernel_equals_analytic_xla(rng, stereo):
    cam, T_gt, T0, pts, obs, sig, mask = _problem(
        rng, n=300, stereo=stereo, mask_off=30)
    kw = _params(cam, stereo)
    T_k, inl_k, n_k, c2_k = pose_lm_pallas(
        T0, pts, obs, sig, mask, interpret=True, **kw)
    T_a, inl_a, n_a, c2_a = pose_lm_xla_reference(
        T0, pts, obs, sig, mask, **kw)
    # interpreter float paths drift at rounding level over 40 iterations —
    # require near-identical pose and (near-)identical classifications
    np.testing.assert_allclose(np.asarray(T_k), np.asarray(T_a),
                               rtol=0, atol=1e-3)
    agree = (np.asarray(inl_k) == np.asarray(inl_a)).mean()
    assert agree >= 0.99, agree
    both = np.asarray(inl_k) & np.asarray(inl_a)
    np.testing.assert_allclose(np.asarray(c2_k)[both], np.asarray(c2_a)[both],
                               rtol=5e-2, atol=1e-3)


def test_pallas_kernel_masked_and_behind(rng):
    """Masked-out rows never become inliers; behind-camera points are ok=0."""
    cam, T_gt, T0, pts_j, obs, sig, mask = _problem(rng, n=128, outliers=0)
    pts = np.asarray(pts_j).copy()
    pts[:10] = -np.asarray(pts[:10])             # behind the camera
    mask = np.asarray(mask).copy()
    mask[20:40] = False
    T_k, inl_k, n_k, c2_k = pose_lm_pallas(
        jnp.asarray(T0), jnp.asarray(pts), obs, sig, jnp.asarray(mask),
        interpret=True, **_params(cam, False))
    inl = np.asarray(inl_k)
    assert not inl[20:40].any()
    assert not inl[:10].any()
    assert inl[40:].mean() > 0.8
