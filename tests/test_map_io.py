"""Map snapshot save/load roundtrip + localization-only mode (ref §3.5)."""
import numpy as np
import pytest

from openvslam_tpu.system import System
from openvslam_tpu.module.tracking_module import TrackerState
from openvslam_tpu.utils import synthetic, evaluate


@pytest.fixture(scope="module")
def mapped_system():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    cfg = _make_config()
    cam = cfg.camera
    rng = np.random.default_rng(21)
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 8), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 4.0, 25)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs])
    s = System(cfg, vocab_path="default")
    s.startup()
    for i in range(len(poses)):
        s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
    s.shutdown()
    return s, cfg, scene, poses


def test_save_load_roundtrip(mapped_system, tmp_path):
    s, cfg, scene, poses = mapped_system
    path = str(tmp_path / "map.msg")
    s.save_map_database(path)

    s2 = System(cfg, vocab_path=None)
    s2.load_map_database(path)
    db1, db2 = s.map_db, s2.map_db
    assert len(db2.valid_kf_ids()) == len(db1.valid_kf_ids())
    assert len(db2.valid_lm_ids()) == len(db1.valid_lm_ids())
    k1 = int(db1.valid_kf_ids()[0])
    k2 = int(db2.valid_kf_ids()[0])
    np.testing.assert_allclose(db1.kf_pose_cw[k1], db2.kf_pose_cw[k2], atol=1e-6)
    np.testing.assert_array_equal(db1.kf_desc_u32[k1], db2.kf_desc_u32[k2])
    # observations and covisibility reconstructed
    l1 = int(db1.valid_lm_ids()[5])
    l2 = int(db2.valid_lm_ids()[5])
    assert db1.lm_num_obs[l1] == db2.lm_num_obs[l2]
    assert len(db2.covis[k2]) == len(db1.covis[k1])


def test_localization_mode(mapped_system, tmp_path):
    s, cfg, scene, poses = mapped_system
    cam = cfg.camera
    path = str(tmp_path / "map2.msg")
    s.save_map_database(path)

    s2 = System(cfg, vocab_path="default")
    s2.load_map_database(path)
    s2.disable_mapping_module()
    s2.startup()
    # force Lost state so localization starts from relocalization
    s2.tracker.state = TrackerState.LOST
    n_kfs_before = s2.map_db.n_kfs
    n_lms_before = len(s2.map_db.valid_lm_ids())
    tracked = 0
    for i in range(8, 16):
        p = s2.feed_monocular_frame(scene.render(cam, poses[i]), 100 + i / 20.0)
        tracked += p is not None
    s2.shutdown()
    assert tracked >= 6, tracked
    # localization mode must not grow the map
    assert s2.map_db.n_kfs == n_kfs_before
    assert len(s2.map_db.valid_lm_ids()) == n_lms_before
    # pose close to the mapping session's estimate for the same frame
    ts1, poses1, m1 = s.tracked_poses()
    ts2, poses2, m2 = s2.tracked_poses()
    i_common = 10
    c1 = -poses1[i_common][:3, :3].T @ poses1[i_common][:3, 3]
    c2 = -poses2[i_common - 8][:3, :3].T @ poses2[i_common - 8][:3, 3]
    assert np.linalg.norm(c1 - c2) < 0.1


def test_localization_mode_pipelined(mapped_system, tmp_path):
    """Localization (frozen map, mapper=None) through the pipelined feed:
    relocalize then keep tracking fused; map must not grow."""
    s, cfg, scene, poses = mapped_system
    cam = cfg.camera
    path = str(tmp_path / "map3.msg")
    s.save_map_database(path)

    s2 = System(cfg, vocab_path="default")
    s2.load_map_database(path)
    s2.disable_mapping_module()
    s2.startup()
    s2.tracker.state = TrackerState.LOST
    n_kfs_before = s2.map_db.n_kfs
    n_lms_before = len(s2.map_db.valid_lm_ids())
    out = list(s2.feed_sequence(
        ((scene.render(cam, poses[i]), 100 + i / 20.0) for i in range(6, 18)),
        kind="monocular", depth=2))
    s2.shutdown()
    assert len(out) == 12
    tracked = sum(p is not None for _, p in out)
    assert tracked >= 9, tracked
    assert s2._fused_frames > 0, "localization never used the fused path"
    assert s2.map_db.n_kfs == n_kfs_before
    assert len(s2.map_db.valid_lm_ids()) == n_lms_before
