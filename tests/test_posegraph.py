import jax.numpy as jnp
import numpy as np

from openvslam_tpu.ops import sim3, se3
from openvslam_tpu.optimize.pose_graph import PoseGraphProblem, make_pose_graph_optimizer
from openvslam_tpu.optimize.sim3_transform import make_sim3_transform_optimizer
from openvslam_tpu.camera import Perspective
from openvslam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.smoke


def _ring_of_poses(n, radius=5.0):
    """Ground-truth Sim3 poses around a circle (scale 1)."""
    Rs, ts = [], []
    for k in range(n):
        a = 2 * np.pi * k / n
        eye = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        T = synthetic.lookat_pose_cw(eye, (0, 0, 0))
        Rs.append(T[:3, :3])
        ts.append(T[:3, 3])
    return np.stack(Rs), np.stack(ts), np.ones(n)


def test_pose_graph_closes_loop(rng):
    n = 32
    R_gt, t_gt, s_gt = _ring_of_poses(n)

    # simulate drift: accumulate noisy odometry (like pre-loop-closure state)
    R_est = [R_gt[0]]
    t_est = [t_gt[0]]
    s_est = [1.0]
    for k in range(1, n):
        # true relative S_k,k-1 = S_k * S_{k-1}^-1, perturbed
        g_prev = (jnp.asarray(R_gt[k - 1], jnp.float32), jnp.asarray(t_gt[k - 1], jnp.float32), jnp.asarray(1.0, jnp.float32))
        g_cur = (jnp.asarray(R_gt[k], jnp.float32), jnp.asarray(t_gt[k], jnp.float32), jnp.asarray(1.0, jnp.float32))
        rel = sim3.compose(g_cur, sim3.inverse(g_prev))
        noise = jnp.asarray(
            np.concatenate([rng.standard_normal(3) * 0.01, rng.standard_normal(3) * 0.02, [rng.standard_normal() * 0.005]]),
            jnp.float32,
        )
        rel_noisy = sim3.compose(sim3.exp(noise), rel)
        g_prev_est = (jnp.asarray(R_est[-1], jnp.float32), jnp.asarray(t_est[-1], jnp.float32), jnp.asarray(s_est[-1], jnp.float32))
        g_new = sim3.compose(rel_noisy, g_prev_est)
        R_est.append(np.asarray(g_new[0]))
        t_est.append(np.asarray(g_new[1]))
        s_est.append(float(g_new[2]))
    R_est = np.stack(R_est).astype(np.float32)
    t_est = np.stack(t_est).astype(np.float32)
    s_est = np.array(s_est, np.float32)

    # edges: odometry chain with the TRUE relative measurements + loop edge n-1 -> 0
    E = n + 8
    e_i = np.zeros(E, np.int32)
    e_j = np.zeros(E, np.int32)
    e_R = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    e_t = np.zeros((E, 3), np.float32)
    e_s = np.ones(E, np.float32)
    e_mask = np.zeros(E, bool)
    for k in range(n):  # edge k -> (k+1)%n, measurement S_j * S_i^-1 from GT
        i, j = k, (k + 1) % n
        gi = (jnp.asarray(R_gt[i], jnp.float32), jnp.asarray(t_gt[i], jnp.float32), jnp.float32(1.0))
        gj = (jnp.asarray(R_gt[j], jnp.float32), jnp.asarray(t_gt[j], jnp.float32), jnp.float32(1.0))
        rel = sim3.compose(gj, sim3.inverse(gi))
        e_i[k], e_j[k] = i, j
        e_R[k] = np.asarray(rel[0])
        e_t[k] = np.asarray(rel[1])
        e_s[k] = float(rel[2])
        e_mask[k] = True

    node_valid = np.ones(n, bool)
    node_fixed = np.zeros(n, bool)
    node_fixed[0] = True

    # pad nodes to capacity 40
    N = 40
    def padN(a, shape_tail):
        out = np.zeros((N,) + shape_tail, a.dtype)
        out[:n] = a
        return out
    prob = PoseGraphProblem(
        jnp.asarray(padN(R_est, (3, 3)) + np.tile(np.eye(3, dtype=np.float32) * 0, (N, 1, 1))),
        jnp.asarray(padN(t_est, (3,))),
        jnp.asarray(np.concatenate([s_est, np.ones(N - n, np.float32)])),
        jnp.asarray(padN(node_valid, ())),
        jnp.asarray(padN(node_fixed, ())),
        jnp.asarray(e_i), jnp.asarray(e_j),
        jnp.asarray(e_R), jnp.asarray(e_t), jnp.asarray(e_s),
        jnp.asarray(e_mask),
    )
    # guard: padded invalid nodes need valid rotations for sim3.log
    prob = prob._replace(R=prob.R.at[n:].set(jnp.eye(3)))

    opt = make_pose_graph_optimizer(iters=25, cg_iters=60)
    R_o, t_o, s_o, cost = opt(prob)

    # drift before vs after: compare camera centers
    def centers(R, t, s):
        return np.stack([-(R[k].T @ (t[k] / s[k])) for k in range(n)])
    c_gt = centers(R_gt, t_gt, s_gt)
    c_before = centers(R_est, t_est, s_est)
    c_after = centers(np.asarray(R_o), np.asarray(t_o), np.asarray(s_o))
    err_before = np.linalg.norm(c_before - c_gt, axis=-1).mean()
    err_after = np.linalg.norm(c_after - c_gt, axis=-1).mean()
    assert err_after < 0.05 * err_before + 1e-3, (err_before, err_after)
    assert float(cost) < 1e-3


def test_sim3_transform_refine(rng):
    cam = Perspective.create(fx=500, fy=500, cx=320, cy=240, cols=640, rows=480)
    # GT Sim3 mapping cam2 coords -> cam1 coords
    R_gt, t_gt, s_gt = synthetic.random_sim3(rng, max_angle=0.3, max_trans=0.5, scale_range=(0.8, 1.3))
    n = 128
    lm2 = synthetic.landmark_cloud(rng, n, center=(0, 0, 5), extent=(3, 2, 1.5))
    g_gt = (jnp.asarray(R_gt, jnp.float32), jnp.asarray(t_gt, jnp.float32), jnp.float32(s_gt))
    lm1 = np.asarray(sim3.transform(g_gt, jnp.asarray(lm2, jnp.float32)))
    uv1, _, _ = cam.project(jnp.asarray(lm1, jnp.float32))
    uv2, _, _ = cam.project(jnp.asarray(lm2, jnp.float32))
    uv1 = np.asarray(uv1) + rng.standard_normal((n, 2)) * 0.3
    uv2 = np.asarray(uv2) + rng.standard_normal((n, 2)) * 0.3

    # initial guess: perturbed GT
    xi = np.concatenate([rng.standard_normal(3) * 0.02, rng.standard_normal(3) * 0.05, [0.03]])
    g0 = sim3.compose(sim3.exp(jnp.asarray(xi, jnp.float32)), g_gt)

    opt = make_sim3_transform_optimizer(cam)
    res = opt(
        g0[0], g0[1], g0[2],
        jnp.asarray(lm1, jnp.float32), jnp.asarray(lm2, jnp.float32),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
        jnp.ones(n, bool),
    )
    assert np.linalg.norm(np.asarray(res.R) - R_gt) < 5e-3
    assert abs(float(res.s) - s_gt) < 5e-3
    assert int(res.num_inliers) > 115


def test_pose_graph_fix_scale(rng):
    """Metric (stereo/RGBD) maps: every vertex's Sim3 scale stays EXACTLY 1
    through the optimization (ref graph_optimizer fix_scale) while the
    rotation/translation drift still closes."""
    n = 24
    R_gt, t_gt, _ = _ring_of_poses(n)

    # SE3-only odometry drift (metric sensors: no scale noise)
    R_est, t_est = [R_gt[0]], [t_gt[0]]
    for k in range(1, n):
        g_prev = (jnp.asarray(R_gt[k - 1], jnp.float32),
                  jnp.asarray(t_gt[k - 1], jnp.float32), jnp.float32(1.0))
        g_cur = (jnp.asarray(R_gt[k], jnp.float32),
                 jnp.asarray(t_gt[k], jnp.float32), jnp.float32(1.0))
        rel = sim3.compose(g_cur, sim3.inverse(g_prev))
        noise = jnp.asarray(np.concatenate([
            rng.standard_normal(3) * 0.01, rng.standard_normal(3) * 0.02,
            [0.0],
        ]), jnp.float32)
        g_new = sim3.compose(
            sim3.compose(sim3.exp(noise), rel),
            (jnp.asarray(R_est[-1], jnp.float32),
             jnp.asarray(t_est[-1], jnp.float32), jnp.float32(1.0)))
        R_est.append(np.asarray(g_new[0]))
        t_est.append(np.asarray(g_new[1]))
    R_est = np.stack(R_est).astype(np.float32)
    t_est = np.stack(t_est).astype(np.float32)

    E = n + 4
    e_i = np.zeros(E, np.int32)
    e_j = np.zeros(E, np.int32)
    e_R = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    e_t = np.zeros((E, 3), np.float32)
    e_s = np.ones(E, np.float32)
    e_mask = np.zeros(E, bool)
    for k in range(n):
        i, j = k, (k + 1) % n
        gi = (jnp.asarray(R_gt[i], jnp.float32), jnp.asarray(t_gt[i], jnp.float32), jnp.float32(1.0))
        gj = (jnp.asarray(R_gt[j], jnp.float32), jnp.asarray(t_gt[j], jnp.float32), jnp.float32(1.0))
        rel = sim3.compose(gj, sim3.inverse(gi))
        e_i[k], e_j[k] = i, j
        e_R[k], e_t[k], e_s[k] = np.asarray(rel[0]), np.asarray(rel[1]), float(rel[2])
        e_mask[k] = True

    node_fixed = np.zeros(n, bool)
    node_fixed[0] = True
    prob = PoseGraphProblem(
        jnp.asarray(R_est), jnp.asarray(t_est), jnp.ones(n),
        jnp.ones(n, bool), jnp.asarray(node_fixed),
        jnp.asarray(e_i), jnp.asarray(e_j),
        jnp.asarray(e_R), jnp.asarray(e_t), jnp.asarray(e_s),
        jnp.asarray(e_mask),
    )
    opt = make_pose_graph_optimizer(iters=25, cg_iters=60, fix_scale=True)
    R_o, t_o, s_o, cost = opt(prob)

    np.testing.assert_allclose(np.asarray(s_o), 1.0, atol=0)   # exactly 1

    def centers(R, t):
        return np.stack([-(R[k].T @ t[k]) for k in range(n)])
    err_before = np.linalg.norm(centers(R_est, t_est) - centers(R_gt, t_gt), axis=-1).mean()
    err_after = np.linalg.norm(
        centers(np.asarray(R_o), np.asarray(t_o)) - centers(R_gt, t_gt), axis=-1).mean()
    assert err_after < 0.05 * err_before + 1e-3, (err_before, err_after)
