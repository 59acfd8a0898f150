"""Concurrent multi-session SLAM + pooled distributed BA (BASELINE config #5).

Three synthetic monocular sessions run concurrently (round-robin frame
interleaving); their maps pool into one landmark-sharded BA solved over the
8-device virtual mesh.  Checks: every session tracks, the pooled solve runs
and reduces reprojection cost, write-back keeps each session's map sane, and
the sharded solve matches a 1-shard solve (shard-count invariance)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.parallel import MultiSessionRunner, make_mesh
from openvslam_tpu.utils import synthetic


def _make_system(cols=416, rows=320, n_feats=500, fx=350.0):
    cfg = Config.from_dict({
        "Camera": {
            "name": f"syn{fx:.0f}", "setup": "monocular", "model": "perspective",
            "fx": fx, "fy": fx, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": n_feats, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    return cfg, System(cfg)


def _session_frames(cam, seed, n_frames=18, center=(0, 0, 6)):
    rng = np.random.default_rng(seed)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=600, center=center, extent=(6, 4.5, 2.5),
        rows=cam.rows, cols=cam.cols,
    )
    poses = synthetic.orbit_trajectory(
        n_frames, radius=2.5, target=center, arc=np.pi / 5
    )
    return [(scene.render(cam, poses[i]), i / 20.0) for i in range(n_frames)], poses


def _pooled_cost(runner):
    """Recompute the pooled robust reprojection cost from the live maps."""
    built = runner.snapshot_problem()
    assert built is not None
    p = built["prob"]
    T = np.asarray(p.T_cw)
    X = np.asarray(p.X)
    oc = np.asarray(p.obs_cam)
    ol = np.asarray(p.obs_lm)
    uv = np.asarray(p.obs_uv)[:, :2]
    s2 = np.asarray(p.obs_sigma2)
    m = np.asarray(p.obs_mask)
    cam = runner.systems[0].cam
    Xc = np.einsum("oij,oj->oi", T[oc][:, :3, :3], X[ol]) + T[oc][:, :3, 3]
    z = np.maximum(Xc[:, 2], 1e-9)
    pred = np.stack([cam.fx * Xc[:, 0] / z + cam.cx,
                     cam.fy * Xc[:, 1] / z + cam.cy], -1)
    c2 = np.sum((uv - pred) ** 2, -1) / s2
    thr = 5.991
    rho = np.where(c2 <= thr, c2, 2 * np.sqrt(thr * np.maximum(c2, 0)) - thr)
    w = m & (Xc[:, 2] > 1e-9)
    return float(np.sum(rho * w))


@pytest.fixture(scope="module")
def multi_run():
    systems = []
    frames = []
    # three distinct sequences (KITTI 00+02+05 analog): same camera, different
    # scenes/textures per seed -> three independent concurrent reconstructions
    for i in range(3):
        cfg, s = _make_system()
        fr, poses = _session_frames(s.cam, seed=20 + i)
        systems.append(s)
        frames.append(fr)
    runner = MultiSessionRunner(systems, mesh=make_mesh(8))
    tracked = runner.run(frames)
    return runner, tracked


def test_all_sessions_track(multi_run):
    runner, tracked = multi_run
    for i, t in enumerate(tracked):
        t = np.array(t)
        assert t.any(), f"session {i} never initialized"
        first = int(np.argmax(t))
        assert t[first:].mean() > 0.8, f"session {i}: {t}"
    for s in runner.systems:
        assert s.map_db.n_kfs >= 2
        assert len(s.map_db.valid_lm_ids()) > 80


def test_joint_distributed_ba_improves(multi_run):
    runner, _ = multi_run
    # perturb every session's map so BA has real work to do
    rng = np.random.default_rng(5)
    for s in runner.systems:
        db = s.map_db
        for k in db.valid_kf_ids():
            k = int(k)
            if k == db.origin_kf:
                continue
            db.kf_pose_cw[k][:3, 3] += rng.standard_normal(3) * 0.01
        for l in db.valid_lm_ids():
            db.lm_pos[int(l)] += rng.standard_normal(3).astype(np.float32) * 0.01
    before = _pooled_cost(runner)
    cost = runner.joint_bundle_adjust(iters=8)
    assert cost is not None and np.isfinite(cost)
    after = _pooled_cost(runner)
    assert after < before * 0.8, (before, after)
    assert runner.joint_ba_runs == 1
    for s in runner.systems:
        db = s.map_db
        for k in db.valid_kf_ids():
            assert np.isfinite(db.kf_pose_cw[int(k)]).all()
        for l in db.valid_lm_ids():
            assert np.isfinite(db.lm_pos[int(l)]).all()


def test_shard_count_invariance(multi_run):
    """The same pooled problem solved on 1-shard and 8-shard meshes must
    agree (the collectives change the schedule, not the math)."""
    runner, _ = multi_run
    built = runner.snapshot_problem()
    assert built is not None
    from openvslam_tpu.parallel.distributed_ba import (
        make_distributed_ba, partition_problem,
    )
    outs = {}
    for shards in (1, 8):
        mesh = make_mesh(shards)
        ba = make_distributed_ba(runner.systems[0].cam, mesh, iters=4)
        sp = partition_problem(built["prob"], shards)
        T, X, cost = ba(sp)
        outs[shards] = (np.asarray(T), float(cost))
    T1, c1 = outs[1]
    T8, c8 = outs[8]
    np.testing.assert_allclose(T1, T8, atol=2e-3)
    assert abs(c1 - c8) / max(c1, 1e-9) < 0.02


BASELINE_M = 0.2


def _make_stereo_system(cols=416, rows=320, fx=350.0):
    cfg = Config.from_dict({
        "Camera": {
            "name": "syn-stereo", "setup": "stereo", "model": "perspective",
            "fx": fx, "fy": fx, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 10,
            "focal_x_baseline": fx * BASELINE_M,
            "depth_threshold": 30.0, "depthmap_factor": 1.0,
        },
        "Feature": {"max_num_keypts": 600, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    return cfg, System(cfg)


def _stereo_frames(cam, seed, n=12, x0=0.0):
    rng = np.random.default_rng(seed)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(x0 - 4, x0 + 10), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols)
    xs = np.linspace(x0, x0 + 4.0, n)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7))
                      for x in xs])
    shift = np.eye(4)
    shift[0, 3] = -BASELINE_M
    return [(scene.render(cam, poses[i]),
             scene.render(cam, shift @ poses[i]), i / 10.0)
            for i in range(n)], poses


def test_pipelined_multi_session():
    """run(pipeline=True): the K feed_sequence generators interleave (K-deep
    cross-session pipeline) with the same tracking quality and a working
    pooled BA on top."""
    systems, frames, all_poses = [], [], []
    for i in range(3):
        cfg, s = _make_system()
        fr, poses = _session_frames(s.cam, seed=20 + i)
        systems.append(s)
        frames.append(fr)
        all_poses.append(poses)
    runner = MultiSessionRunner(systems, mesh=make_mesh(8))
    tracked = runner.run(frames, joint_ba_every=30, joint_ba_iters=4,
                         pipeline=True)
    runner.shutdown()
    for i, t in enumerate(tracked):
        t = np.array(t)
        assert len(t) == len(frames[i])
        assert t.any(), f"session {i} never initialized"
        first = int(np.argmax(t))
        assert t[first:].mean() > 0.8, f"session {i}: {t}"
    assert runner.joint_ba_runs >= 1
    for i, s in enumerate(systems):
        assert s._fused_frames > 0, f"session {i} never pipelined"
        assert s.map_db.n_kfs >= 2
        for k in s.map_db.valid_kf_ids():
            assert np.isfinite(s.map_db.kf_pose_cw[int(k)]).all()


def test_stereo_multi_session_pooled_ba():
    """All-stereo sessions pool with stereo (u, v, u_right) edges — the
    KITTI 00+02+05 configuration (ref: stereo reprojection edges in BA)."""
    systems, streams = [], []
    for i in range(2):
        cfg, s = _make_stereo_system()
        fr, _ = _stereo_frames(s.cam, seed=60 + i, x0=30.0 * i)
        systems.append(s)
        streams.append(fr)
    runner = MultiSessionRunner(systems, mesh=make_mesh(8))
    tracked = runner.run(streams)
    for i, t in enumerate(tracked):
        assert np.mean(t) > 0.8, f"stereo session {i}: {t}"
    built = runner.snapshot_problem()
    assert built is not None
    assert built["stereo"] and not built["multicam"]
    assert built["prob"].obs_uv.shape[-1] == 3
    # stereo obs actually carry x_right (not all mono-marked)
    ouv = np.asarray(built["prob"].obs_uv)
    om = np.asarray(built["prob"].obs_mask)
    assert (ouv[om, 2] >= 0).mean() > 0.5, "no stereo observations pooled"
    cost = runner.joint_bundle_adjust(iters=6)
    assert cost is not None and np.isfinite(cost)
    for s in systems:
        db = s.map_db
        for k in db.valid_kf_ids():
            assert np.isfinite(db.kf_pose_cw[int(k)]).all()
        # metric scale survives the pooled solve (stereo maps are metric):
        # consecutive-KF spacing stays within the rendered 4 m span
        ids = sorted(int(k) for k in db.valid_kf_ids())
        cs = np.stack([
            -db.kf_pose_cw[k][:3, :3].T @ db.kf_pose_cw[k][:3, 3] for k in ids
        ])
        span = np.linalg.norm(cs[-1] - cs[0])
        assert 1.0 < span < 8.0, span

    # in-session stereo global BA (D=3 path in _build_global_ba)
    s0 = systems[0]
    s0.global_optimizer.run_global_ba(iters=6)
    for k in s0.map_db.valid_kf_ids():
        assert np.isfinite(s0.map_db.kf_pose_cw[int(k)]).all()


def test_session_dropout_survival(small_sessions=None):
    """SURVEY §5.3: a session that dies mid-stream is dropped; the
    surviving sessions keep tracking and the pooled BA still runs."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    from openvslam_tpu.system import System
    from openvslam_tpu.parallel.multi_session import MultiSessionRunner
    from openvslam_tpu.utils import synthetic

    cfg = _make_config()
    cam = cfg.camera
    rng = np.random.default_rng(5)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 8), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols)
    xs = np.linspace(0.0, 2.5, 14)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs])

    def frames_ok():
        for i in range(len(poses)):
            yield (scene.render(cam, poses[i]), i / 20.0)

    def frames_dying():
        for i in range(len(poses)):
            if i == 6:
                raise RuntimeError("injected session fault")
            yield (scene.render(cam, poses[i]), i / 20.0)

    systems = [System(cfg, vocab_path="default") for _ in range(2)]
    runner = MultiSessionRunner(systems)
    tracked = runner.run([frames_ok(), frames_dying()], joint_ba_every=0)
    runner.joint_bundle_adjust(iters=4)
    runner.shutdown()
    assert runner.failed == [1]
    assert len(tracked[0]) == len(poses)          # survivor ran to the end
    assert sum(tracked[0]) >= len(poses) - 3
    assert len(tracked[1]) == 6                   # died at frame 6
