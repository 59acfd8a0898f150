import jax
import jax.numpy as jnp
import numpy as np

from openvslam_tpu.ops import ransac, solvers, triangulate
from openvslam_tpu.utils import synthetic
import pytest

pytestmark = pytest.mark.smoke


def _two_view_scene(rng, n=200, n_out=40, planar=False):
    if planar:
        pts = synthetic.landmark_cloud(rng, n, center=(0, 0, 6), extent=(4, 3, 0.0))
    else:
        pts = synthetic.landmark_cloud(rng, n, center=(0, 0, 6), extent=(4, 3, 2.0))
    T1 = np.eye(4)
    T2 = synthetic.lookat_pose_cw(eye=(1.0, 0.2, 0.3), target=(0, 0, 6))
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])

    def proj(T):
        pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
        uv = (K @ (pc / pc[:, 2:]).T).T[:, :2]
        return pc, uv

    pc1, uv1 = proj(T1)
    pc2, uv2 = proj(T2)
    # inject outliers
    idx = rng.choice(n, n_out, replace=False)
    uv2_noisy = uv2.copy()
    uv2_noisy[idx] += (rng.random((n_out, 2)) - 0.5) * 200
    inlier_gt = np.ones(n, bool)
    inlier_gt[idx] = False
    return pts, T1, T2, K, uv1, uv2_noisy, inlier_gt


def test_fundamental_ransac(rng):
    pts, T1, T2, K, uv1, uv2, inl_gt = _two_view_scene(rng)
    p1 = jnp.asarray(uv1, jnp.float32)
    p2 = jnp.asarray(uv2, jnp.float32)
    mask = jnp.ones(p1.shape[0], bool)
    key = jax.random.PRNGKey(0)
    fit = lambda idx: solvers.fit_fundamental(p1[idx], p2[idx])
    score = lambda F: solvers.score_fundamental(F, p1, p2, mask, sigma=1.0)
    F, s, inl = ransac.run_ransac(key, fit, score, mask, n_hyp=256, k=8)
    inl = np.asarray(inl)
    # recovered inliers should be ~true inliers
    assert inl[inl_gt].mean() > 0.95
    assert (~inl[~inl_gt]).mean() > 0.9
    # F consistent with GT epipolar geometry on clean points
    Fnp = np.asarray(F)
    h1 = np.concatenate([uv1, np.ones((len(uv1), 1))], -1)
    uv2c = ((T2[:3, :3] @ pts.T).T + T2[:3, 3])
    uv2c = (K @ (uv2c / uv2c[:, 2:]).T).T[:, :2]
    h2 = np.concatenate([uv2c, np.ones((len(uv2c), 1))], -1)
    resid = np.abs(np.sum(h2 * (h1 @ Fnp.T), -1)) / np.linalg.norm((h1 @ Fnp.T)[:, :2], axis=-1)
    assert np.median(resid) < 0.5


def test_homography_ransac_planar(rng):
    pts, T1, T2, K, uv1, uv2, inl_gt = _two_view_scene(rng, planar=True)
    p1 = jnp.asarray(uv1, jnp.float32)
    p2 = jnp.asarray(uv2, jnp.float32)
    mask = jnp.ones(p1.shape[0], bool)
    key = jax.random.PRNGKey(1)
    fit = lambda idx: solvers.fit_homography(p1[idx], p2[idx])
    score = lambda H: solvers.score_homography(H, p1, p2, mask, sigma=1.0)
    H, s, inl = ransac.run_ransac(key, fit, score, mask, n_hyp=256, k=4)
    inl = np.asarray(inl)
    assert inl[inl_gt].mean() > 0.95
    assert (~inl[~inl_gt]).mean() > 0.9


def test_essential_decompose_recovers_pose(rng):
    pts, T1, T2, K, uv1, uv2, inl_gt = _two_view_scene(rng, n_out=0)
    b1 = np.concatenate([(uv1 - K[:2, 2]) / K[0, 0], np.ones((len(uv1), 1))], -1)
    b2 = np.concatenate([(uv2 - K[:2, 2]) / K[0, 0], np.ones((len(uv2), 1))], -1)
    b1 /= np.linalg.norm(b1, axis=-1, keepdims=True)
    b2 /= np.linalg.norm(b2, axis=-1, keepdims=True)
    b1j, b2j = jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32)
    mask = jnp.ones(len(b1), bool)
    key = jax.random.PRNGKey(2)
    fit = lambda idx: solvers.fit_essential(b1j[idx], b2j[idx])
    score = lambda E: solvers.score_essential(E, b1j, b2j, mask)
    E, s, inl = ransac.run_ransac(key, fit, score, mask, n_hyp=128, k=8)
    assert np.asarray(inl).mean() > 0.9
    Rs, ts = solvers.decompose_essential(E)
    # pick hypothesis by triangulated-point cheirality
    T21_gt = T2 @ np.linalg.inv(T1)
    R_gt = T21_gt[:3, :3]
    t_gt = T21_gt[:3, 3] / np.linalg.norm(T21_gt[:3, 3])
    best_err = 1e9
    for i in range(4):
        r_err = np.linalg.norm(np.asarray(Rs[i]) - R_gt)
        t_err = min(np.linalg.norm(np.asarray(ts[i]) - t_gt), np.linalg.norm(np.asarray(ts[i]) + t_gt))
        best_err = min(best_err, r_err + t_err)
    assert best_err < 0.05


def test_pnp_ransac(rng):
    pts = synthetic.landmark_cloud(rng, 128, center=(0, 0, 6), extent=(4, 3, 2))
    T = synthetic.lookat_pose_cw(eye=(0.5, -0.3, 0.8), target=(0, 0, 6))
    pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
    brg = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
    # outliers
    out_idx = rng.choice(128, 25, replace=False)
    brg_noisy = brg.copy()
    rnd = rng.standard_normal((25, 3))
    brg_noisy[out_idx] = rnd / np.linalg.norm(rnd, axis=-1, keepdims=True)
    bj = jnp.asarray(brg_noisy, jnp.float32)
    pj = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones(128, bool)
    key = jax.random.PRNGKey(3)
    fit = lambda idx: solvers.fit_pnp_dlt(bj[idx], pj[idx])
    score = lambda M: solvers.score_pnp(M, bj, pj, mask)
    T_est, s, inl = ransac.run_ransac(key, fit, score, mask, n_hyp=128, k=6)
    T_est = np.asarray(T_est)
    assert np.linalg.norm(T_est[:3, :3] - T[:3, :3]) < 0.01
    assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.02


def test_pnp_epnp_exact_and_minimal(rng):
    """EPnP (ref pnp_solver: EPnP on bearings): exact on clean full sets,
    usable on 4-point minimal sets (>=60% solve rate; each failure just
    scores no RANSAC inliers)."""
    ok = 0
    for trial in range(20):
        pts = synthetic.landmark_cloud(rng, 40, center=(0, 0, 6),
                                       extent=(4, 3, 2))
        T = synthetic.lookat_pose_cw(
            eye=rng.uniform(-1, 1, 3) * 0.5 + np.array([0.3, -0.2, 0.5]),
            target=(0, 0, 6))
        pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
        brg = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
        Te = np.asarray(solvers.fit_pnp_epnp(
            jnp.asarray(brg, jnp.float32), jnp.asarray(pts, jnp.float32)))
        assert np.linalg.norm(Te[:3, :3] - T[:3, :3]) < 1e-3
        assert np.linalg.norm(Te[:3, 3] - T[:3, 3]) < 1e-3
        idx = rng.choice(40, 4, replace=False)
        Tm = np.asarray(solvers.fit_pnp_epnp(
            jnp.asarray(brg[idx], jnp.float32),
            jnp.asarray(pts[idx], jnp.float32)))
        ok += np.linalg.norm(Tm[:3, :3] - T[:3, :3]) < 1e-2
    assert ok >= 12, ok


def test_pnp_epnp_ransac_heavy_outliers(rng):
    """4-point EPnP RANSAC survives 55% outliers where 6-point sampling has
    a much lower all-inlier hit rate."""
    pts = synthetic.landmark_cloud(rng, 128, center=(0, 0, 6), extent=(4, 3, 2))
    T = synthetic.lookat_pose_cw(eye=(0.5, -0.3, 0.8), target=(0, 0, 6))
    pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
    brg = pc / np.linalg.norm(pc, axis=-1, keepdims=True)
    out_idx = rng.choice(128, 70, replace=False)
    brg_noisy = brg.copy()
    rnd = rng.standard_normal((70, 3))
    brg_noisy[out_idx] = rnd / np.linalg.norm(rnd, axis=-1, keepdims=True)
    bj = jnp.asarray(brg_noisy, jnp.float32)
    pj = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones(128, bool)
    key = jax.random.PRNGKey(5)
    fit = lambda idx: solvers.fit_pnp_epnp(bj[idx], pj[idx])
    score = lambda M: solvers.score_pnp(M, bj, pj, mask)
    T_est, s, inl = ransac.run_ransac(key, fit, score, mask, n_hyp=128, k=4)
    T_est = np.asarray(T_est)
    assert np.linalg.norm(T_est[:3, :3] - T[:3, :3]) < 0.01
    assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.02


def test_sim3_horn(rng):
    R_gt, t_gt, s_gt = synthetic.random_sim3(rng)
    p1 = rng.standard_normal((64, 3))
    p2 = (s_gt * (R_gt @ p1.T)).T + t_gt
    R, t, s = solvers.fit_sim3_horn(jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32))
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)
    np.testing.assert_allclose(float(s), s_gt, rtol=1e-4)
    # fixed scale variant
    p2b = (R_gt @ p1.T).T + t_gt
    R2, t2, s2 = solvers.fit_sim3_horn(
        jnp.asarray(p1, jnp.float32), jnp.asarray(p2b, jnp.float32), fix_scale=True
    )
    assert float(s2) == 1.0
    np.testing.assert_allclose(np.asarray(R2), R_gt, atol=1e-4)


def test_triangulation(rng):
    pts = synthetic.landmark_cloud(rng, 256, center=(0, 0, 6), extent=(4, 3, 2))
    T1 = np.eye(4)
    T2 = synthetic.lookat_pose_cw(eye=(1.0, 0.0, 0.0), target=(0, 0, 6))
    pc1 = (T1[:3, :3] @ pts.T).T + T1[:3, 3]
    pc2 = (T2[:3, :3] @ pts.T).T + T2[:3, 3]
    b1 = pc1 / np.linalg.norm(pc1, axis=-1, keepdims=True)
    b2 = pc2 / np.linalg.norm(pc2, axis=-1, keepdims=True)
    X, ok = triangulate.triangulate_two_view(
        jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32),
        jnp.asarray(T1, jnp.float32), jnp.asarray(T2, jnp.float32),
    )
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(X), pts, atol=5e-3)
    z1, z2, cospar = triangulate.depths_and_parallax(
        X, jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32),
        jnp.asarray(T1, jnp.float32), jnp.asarray(T2, jnp.float32),
    )
    assert (np.asarray(z1) > 0).all() and (np.asarray(z2) > 0).all()
    assert (np.asarray(cospar) < 1.0).all()
