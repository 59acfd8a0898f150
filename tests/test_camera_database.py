"""Camera database (ref data/camera_database): per-keyframe cameras,
multi-camera merge via absorb(), and IO roundtrip."""
import numpy as np

from openvslam_tpu.camera.base import camera_to_config, make_camera_from_config
from openvslam_tpu.config import Config
from openvslam_tpu.data import MapDatabase
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic


def _cfg(name, fx, rows=240, cols=320):
    return Config.from_dict({
        "Camera": {
            "name": name, "setup": "monocular", "model": "perspective",
            "fx": fx, "fy": fx, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": 400, "num_levels": 3, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })


def _run_short_session(cfg, seed):
    cam = cfg.camera
    rng = np.random.default_rng(seed)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=500, center=(0, 0, 6), extent=(5, 4, 2),
        rows=cam.rows, cols=cam.cols,
    )
    poses = synthetic.orbit_trajectory(10, radius=2.0, target=(0, 0, 6),
                                       arc=np.pi / 6)
    s = System(cfg)
    s.startup()
    for i in range(10):
        s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
    s.shutdown()
    return s


def test_camera_spec_roundtrip():
    cfg = _cfg("camA", 260.0)
    spec = camera_to_config(cfg.camera)
    cam2 = make_camera_from_config(spec)
    assert float(cam2.fx) == float(cfg.camera.fx)
    assert int(cam2.cols) == int(cfg.camera.cols)
    assert cam2.setup == cfg.camera.setup


def test_every_keyframe_has_camera():
    s = _run_short_session(_cfg("camA", 260.0), seed=5)
    db = s.map_db
    assert db.n_kfs >= 2
    assert "camA" in db.cameras
    for k in db.valid_kf_ids():
        assert db.kf_camera[int(k)] == "camA"
    cam = db.get_camera("camA")
    assert float(cam.fx) == 260.0


def test_absorb_merges_cameras():
    sA = _run_short_session(_cfg("camA", 260.0), seed=5)
    sB = _run_short_session(_cfg("camB", 300.0), seed=9)
    kf_map, _ = sA.map_db.absorb(sB.map_db)
    db = sA.map_db
    assert set(db.cameras) >= {"camA", "camB"}
    for old, new in kf_map.items():
        assert db.kf_camera[new] == "camB"
    # same name, different intrinsics -> suffixed, not clobbered
    sC = _run_short_session(_cfg("camA", 400.0), seed=11)
    kf_map2, _ = db.absorb(sC.map_db)
    renamed = db.kf_camera[next(iter(kf_map2.values()))]
    assert renamed != "camA" and renamed in db.cameras
    assert float(db.get_camera(renamed).fx) == 400.0
    assert float(db.get_camera("camA").fx) == 260.0


def test_map_io_preserves_cameras(tmp_path):
    sA = _run_short_session(_cfg("camA", 260.0), seed=5)
    sB = _run_short_session(_cfg("camB", 300.0), seed=9)
    sA.map_db.absorb(sB.map_db)
    p = tmp_path / "multi.msg"
    sA.save_map_database(str(p))

    # load into a fresh session whose own camera collides by name
    s2 = System(_cfg("camA", 999.0))
    s2.load_map_database(str(p))
    db2 = s2.map_db
    names = {db2.kf_camera[int(k)] for k in db2.valid_kf_ids()}
    assert len(names) == 2
    fxs = sorted(float(db2.get_camera(n).fx) for n in names)
    assert fxs == [260.0, 300.0]
    # the session's own (fx=999) camera is still present under "camA"
    assert float(db2.get_camera("camA").fx) == 999.0
