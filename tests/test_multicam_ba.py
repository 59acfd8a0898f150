"""Mixed-camera bundle adjustment: per-observation intrinsics (ref: g2o
reproj edges carry their keyframe's camera).  Two perspective cameras with
different focal lengths + one equirectangular rig observe the same points;
BA over perturbed poses must recover ground truth."""
import numpy as np
import jax.numpy as jnp
import pytest

from openvslam_tpu.optimize import residuals as R
from openvslam_tpu.optimize.ba import BAProblem, make_global_ba
from openvslam_tpu.utils import synthetic


def _project_pinhole(T, X, fx, fy, cx, cy):
    Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
    return np.stack([fx * Xc[:, 0] / Xc[:, 2] + cx,
                     fy * Xc[:, 1] / Xc[:, 2] + cy], -1), Xc[:, 2]


def _project_equirect(T, X, cols, rows):
    Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
    d = np.linalg.norm(Xc, axis=-1)
    b = Xc / d[:, None]
    lat = -np.arcsin(np.clip(b[:, 1], -1, 1))
    lon = np.arctan2(b[:, 0], b[:, 2])
    return np.stack([cols * (0.5 + lon / (2 * np.pi)),
                     rows * (0.5 - lat / np.pi)], -1), d


def _build_multicam_problem(with_equirect):
    rng = np.random.default_rng(3)
    n_pts = 120
    X_gt = rng.uniform(-3, 3, (n_pts, 3)) + np.array([0, 0, 8.0])

    specA = {"model": "perspective", "fx": 300.0, "fy": 300.0,
             "cx": 208.0, "cy": 160.0, "cols": 416, "rows": 320}
    specB = {"model": "perspective", "fx": 520.0, "fy": 500.0,
             "cx": 320.0, "cy": 240.0, "cols": 640, "rows": 480}
    specE = {"model": "equirectangular", "cols": 1920, "rows": 960}

    rigs = [(specA, synthetic.lookat_pose_cw((x, 0, 0), (0, 0, 8)))
            for x in (-1.0, -0.4)]
    rigs += [(specB, synthetic.lookat_pose_cw((x, 0.3, 0.4), (0, 0, 8)))
             for x in (0.4, 1.0)]
    if with_equirect:
        rigs += [(specE, synthetic.lookat_pose_cw((0.0, -0.5, 1.0), (0, 0, 8)))]

    C = 8
    L = 128
    O = 1024
    T = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    cam_opt = np.zeros(C, bool)
    cam_valid = np.zeros(C, bool)
    D = 2 + R.CAMV_DIM
    oc = np.zeros(O, np.int32)
    ol = np.zeros(O, np.int32)
    ouv = np.zeros((O, D), np.float32)
    osg = np.ones(O, np.float32)
    om = np.zeros(O, bool)
    n_obs = 0
    T_gt = []
    for i, (spec, T_cw) in enumerate(rigs):
        T_gt.append(T_cw.astype(np.float32))
        cam_valid[i] = True
        # gauge: fix rigs 0 and 1 (mono BA has a free global scale; fixing
        # two cameras pins it, the same role the reference's fixed KF set
        # plays in loop BA)
        cam_opt[i] = i > 1
        camv = R.make_camv(spec)
        if spec["model"] == "equirectangular":
            uv, depth = _project_equirect(T_cw, X_gt, spec["cols"], spec["rows"])
            ok = depth > 0.1
        else:
            uv, depth = _project_pinhole(T_cw, X_gt, spec["fx"], spec["fy"],
                                         spec["cx"], spec["cy"])
            ok = (depth > 0.1) & (uv[:, 0] > 0) & (uv[:, 0] < spec["cols"]) \
                & (uv[:, 1] > 0) & (uv[:, 1] < spec["rows"])
        for j in np.where(ok)[0]:
            oc[n_obs] = i
            ol[n_obs] = j
            ouv[n_obs, :2] = uv[j]
            ouv[n_obs, 2:] = camv
            om[n_obs] = True
            n_obs += 1
        # perturbed initial pose (rig 0 stays exact: it is the gauge)
        pert = synthetic.random_pose_cw(rng, max_angle=0.02, max_trans=0.05) \
            if i > 1 else np.eye(4, dtype=np.float32)
        T[i] = (pert @ T_cw).astype(np.float32)

    X0 = X_gt + rng.normal(0, 0.05, X_gt.shape)
    Xp = np.zeros((L, 3), np.float32)
    lm_valid = np.zeros(L, bool)
    Xp[:n_pts] = X0
    lm_valid[:n_pts] = True

    prob = BAProblem(
        jnp.asarray(T), jnp.asarray(cam_opt), jnp.asarray(cam_valid),
        jnp.asarray(Xp), jnp.asarray(lm_valid),
        jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(ouv),
        jnp.asarray(osg), jnp.asarray(om),
    )
    return prob, T_gt, X_gt, n_pts, len(rigs)


def _check_recovery(res, T_gt, X_gt, n_pts, n_rigs):
    T_out = np.asarray(res.T_cw)
    X_out = np.asarray(res.X)
    for i in range(n_rigs):
        err_t = np.linalg.norm(T_out[i][:3, 3] - T_gt[i][:3, 3])
        assert err_t < 2e-3, f"rig {i} translation error {err_t}"
        err_r = np.linalg.norm(T_out[i][:3, :3] - T_gt[i][:3, :3])
        assert err_r < 2e-3, f"rig {i} rotation error {err_r}"
    pt_err = np.linalg.norm(X_out[:n_pts] - X_gt, axis=-1)
    assert np.median(pt_err) < 5e-3


@pytest.mark.parametrize("with_equirect", [False, True])
def test_multicam_global_ba_recovers(with_equirect):
    prob, T_gt, X_gt, n_pts, n_rigs = _build_multicam_problem(with_equirect)
    ba = make_global_ba(None, iters=12, cg_iters=40,
                        res_fn_override=R.make_multicam_mono_residual())
    _check_recovery(ba(prob), T_gt, X_gt, n_pts, n_rigs)


def test_multicam_local_ba_recovers():
    """Dense-Schur local BA with per-observation intrinsics (the path the
    mapping module takes when a merged-session local window spans cameras)."""
    from openvslam_tpu.optimize.ba import make_local_ba
    prob, T_gt, X_gt, n_pts, n_rigs = _build_multicam_problem(True)
    ba = make_local_ba(None, first_iters=6, second_iters=8,
                       res_fn_override=R.make_multicam_mono_residual())
    _check_recovery(ba(prob), T_gt, X_gt, n_pts, n_rigs)
