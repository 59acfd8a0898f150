import jax.numpy as jnp
import numpy as np

from openvslam_tpu.camera import Perspective
from openvslam_tpu.optimize.ba import BAProblem, make_local_ba, make_global_ba
from openvslam_tpu.ops import se3
from openvslam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.smoke


def _build_problem(rng, n_cams=8, n_fixed=2, n_lms=300, C=16, L=512, O=4096,
                   noise_px=0.5, perturb=True):
    cam = Perspective.create(fx=500, fy=500, cx=320, cy=240, cols=640, rows=480)
    pts = synthetic.landmark_cloud(rng, n_lms, center=(0, 0, 6), extent=(5, 4, 2))
    poses = synthetic.orbit_trajectory(n_cams, radius=1.5, target=(0, 0, 6))

    obs_cam, obs_lm, obs_uv = [], [], []
    for c in range(n_cams):
        pc = (poses[c, :3, :3] @ pts.T).T + poses[c, :3, 3]
        uv, _, valid = cam.project(jnp.asarray(pc, jnp.float32))
        uv = np.asarray(uv).copy()
        v = np.asarray(valid)
        for l in np.where(v)[0]:
            obs_cam.append(c)
            obs_lm.append(l)
            obs_uv.append(uv[l] + rng.standard_normal(2) * noise_px)
    n_obs = len(obs_cam)
    assert n_obs <= O, n_obs

    T = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    T[:n_cams] = poses
    T_true = T.copy()
    X = np.zeros((L, 3), np.float32)
    X[:n_lms] = pts
    X_true = X.copy()
    if perturb:
        for c in range(n_fixed, n_cams):
            xi = rng.standard_normal(6) * np.array([0.01, 0.01, 0.01, 0.03, 0.03, 0.03])
            T[c] = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32))) @ T[c]
        X[:n_lms] += rng.standard_normal((n_lms, 3)) * 0.03

    oc = np.zeros(O, np.int32)
    ol = np.zeros(O, np.int32)
    ouv = np.zeros((O, 2), np.float32)
    om = np.zeros(O, bool)
    oc[:n_obs] = obs_cam
    ol[:n_obs] = obs_lm
    ouv[:n_obs] = obs_uv
    om[:n_obs] = True

    cam_opt = np.zeros(C, bool)
    cam_opt[n_fixed:n_cams] = True
    cam_valid = np.zeros(C, bool)
    cam_valid[:n_cams] = True
    lm_valid = np.zeros(L, bool)
    lm_valid[:n_lms] = True

    prob = BAProblem(
        jnp.asarray(T), jnp.asarray(cam_opt), jnp.asarray(cam_valid),
        jnp.asarray(X), jnp.asarray(lm_valid),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.ones(O, jnp.float32), jnp.asarray(om),
    )
    return cam, prob, T_true, X_true, n_cams, n_lms


def _pose_errors(T_est, T_true, n_cams):
    errs = []
    for c in range(n_cams):
        d = np.linalg.inv(T_true[c]) @ T_est[c]
        errs.append(np.linalg.norm(d[:3, 3]))
    return np.array(errs)


def test_local_ba_exact_noiseless(rng):
    cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(rng, noise_px=0.0)
    res = make_local_ba(cam)(prob)
    errs = _pose_errors(np.asarray(res.T_cw), T_true, n_cams)
    assert errs.max() < 1e-4, errs
    lm_err = np.linalg.norm(np.asarray(res.X)[:n_lms] - X_true[:n_lms], axis=-1)
    assert np.median(lm_err) < 1e-4


def test_local_ba_converges(rng):
    cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(rng)
    ba = make_local_ba(cam)
    res = ba(prob)
    T_est = np.asarray(res.T_cw)
    X_est = np.asarray(res.X)
    errs = _pose_errors(T_est, T_true, n_cams)
    # fixed cams untouched
    np.testing.assert_allclose(T_est[0], T_true[0], atol=1e-6)
    np.testing.assert_allclose(T_est[1], T_true[1], atol=1e-6)
    assert errs.max() < 0.015, errs
    # landmarks recovered to the triangulation noise floor
    # (sigma_z ~ z^2/(f b) * 0.5px ~ 0.024 m at depth 6)
    lm_err = np.linalg.norm(X_est[:n_lms] - X_true[:n_lms], axis=-1)
    assert np.median(lm_err) < 0.05
    assert np.asarray(res.obs_inlier).sum() > 0.9 * np.asarray(prob.obs_mask).sum()


def test_local_ba_handles_outlier_observations(rng):
    cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(rng)
    # corrupt 5% of observations
    om = np.asarray(prob.obs_mask)
    n_obs = om.sum()
    bad = rng.choice(n_obs, n_obs // 20, replace=False)
    ouv = np.asarray(prob.obs_uv).copy()
    ouv[bad] += (rng.random((len(bad), 2)) - 0.5) * 120 + 15
    prob = prob._replace(obs_uv=jnp.asarray(ouv))
    ba = make_local_ba(cam)
    res = ba(prob)
    errs = _pose_errors(np.asarray(res.T_cw), T_true, n_cams)
    assert errs.max() < 0.02, errs
    inl = np.asarray(res.obs_inlier)
    assert inl[bad].mean() < 0.3


def test_global_ba_pcg(rng):
    cam, prob, T_true, X_true, n_cams, n_lms = _build_problem(rng, n_fixed=1)
    ba = make_global_ba(cam, iters=12, cg_iters=30)
    res = ba(prob)
    errs = _pose_errors(np.asarray(res.T_cw), T_true, n_cams)
    assert errs.max() < 0.015, errs
    lm_err = np.linalg.norm(np.asarray(res.X)[:n_lms] - X_true[:n_lms], axis=-1)
    assert np.median(lm_err) < 0.05
