"""Reference-format msgpack map interop (io/msgpack_compat).

Covers: schema shape of the saved file (the reference's
``cameras``/``keyframes``/``landmarks``/``*_next_id`` layout), full
save->load roundtrip into a fresh database (poses, descriptors, graph,
observations), quaternion/descriptor codecs, format sniffing, and
localization on a map loaded from the reference format.
"""
import msgpack
import numpy as np
import pytest

from openvslam_tpu.io import msgpack_compat as mc
from openvslam_tpu.system import System
from openvslam_tpu.module.tracking_module import TrackerState
from openvslam_tpu.utils import synthetic


def test_quat_codec_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(50):
        w = rng.standard_normal(3)
        th = np.linalg.norm(w)
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        q = mc.rot_to_quat_xyzw(R)
        np.testing.assert_allclose(mc.quat_xyzw_to_rot(q), R, atol=1e-9)


def test_desc_codec_roundtrip():
    rng = np.random.default_rng(4)
    row = rng.integers(0, 2**32, 8, dtype=np.uint32)
    buf = mc.desc_u32_to_bytes(row)
    assert isinstance(buf, bytes) and len(buf) == 32
    np.testing.assert_array_equal(mc.desc_bytes_to_u32(buf), row)
    # byte order: bit k of the 32-byte string = test index k, LSB-first per
    # byte (OpenCV ORB layout)
    one = np.zeros(8, np.uint32)
    one[0] = 1  # test index 0
    assert mc.desc_u32_to_bytes(one)[0] == 0x01
    one[0] = 0x80  # test index 7 -> MSB of byte 0
    assert mc.desc_u32_to_bytes(one)[0] == 0x80
    one[0] = 0x100  # test index 8 -> bit 0 of byte 1
    assert mc.desc_u32_to_bytes(one)[1] == 0x01


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


def test_schema_shape(mapped_system, tmp_path):
    s, cfg, scene, poses = mapped_system
    path = str(tmp_path / "ref_format.msg")
    s.save_map_database(path, format="openvslam")
    with open(path, "rb") as f:
        blob = msgpack.unpackb(f.read(), raw=False)
    # reference top-level layout
    for key in ("cameras", "keyframes", "landmarks", "frame_next_id",
                "keyframe_next_id", "landmark_next_id"):
        assert key in blob, key
    assert "format" not in blob
    assert isinstance(blob["keyframes"], dict)
    kf = next(iter(blob["keyframes"].values()))
    for key in ("ts", "cam", "rot_cw", "trans_cw", "n_keypts", "keypts",
                "undists", "x_rights", "depths", "descs", "lm_ids",
                "span_parent", "span_children", "loop_edges",
                "n_scale_levels", "scale_factor"):
        assert key in kf, key
    assert len(kf["rot_cw"]) == 4 and len(kf["trans_cw"]) == 3
    assert kf["n_keypts"] == len(kf["keypts"]) == len(kf["descs"])
    assert len(kf["lm_ids"]) == kf["n_keypts"]
    assert isinstance(kf["descs"][0], bytes) and len(kf["descs"][0]) == 32
    kp = kf["keypts"][0]
    assert set(kp) == {"pt", "ang", "oct"}
    lm = next(iter(blob["landmarks"].values()))
    for key in ("1st_keyfrm", "pos_w", "ref_keyfrm", "n_vis", "n_fnd"):
        assert key in lm, key
    cam_j = next(iter(blob["cameras"].values()))
    assert cam_j["model_type"] == "Perspective"
    assert cam_j["setup_type"] == "Monocular"
    assert {"fx", "fy", "cx", "cy", "cols", "rows", "fps"} <= set(cam_j)


def test_roundtrip_into_fresh_db(mapped_system, tmp_path):
    s, cfg, scene, poses = mapped_system
    path = str(tmp_path / "ref_roundtrip.msg")
    s.save_map_database(path, format="openvslam")

    from openvslam_tpu.io.msgpack_compat import is_openvslam_format
    assert is_openvslam_format(path)

    s2 = System(cfg, vocab_path=None)
    s2.load_map_database(path)
    db1, db2 = s.map_db, s2.map_db
    ids1, ids2 = db1.valid_kf_ids(), db2.valid_kf_ids()
    assert len(ids1) == len(ids2)
    assert len(db1.valid_lm_ids()) == len(db2.valid_lm_ids())
    # poses survive the quaternion round trip
    for k1, k2 in zip(ids1, ids2):
        np.testing.assert_allclose(
            db1.kf_pose_cw[int(k1)], db2.kf_pose_cw[int(k2)], atol=1e-5)
    # descriptors survive compaction: compare the valid sets as multisets
    k1, k2 = int(ids1[0]), int(ids2[0])
    d1 = db1.kf_desc_u32[k1][db1.kf_kpt_valid[k1].astype(bool)]
    d2 = db2.kf_desc_u32[k2][db2.kf_kpt_valid[k2].astype(bool)]
    assert d1.shape == d2.shape
    order1 = np.lexsort(d1.T)
    order2 = np.lexsort(d2.T)
    np.testing.assert_array_equal(d1[order1], d2[order2])
    # graph: covisibility weights + spanning tree shape reconstructed
    assert len(db2.covis[k2]) == len(db1.covis[k1])
    assert (db2.parent[int(ids2[1])] >= 0) == (db1.parent[int(ids1[1])] >= 0)
    # observation counts per landmark (multiset)
    o1 = sorted(int(db1.lm_num_obs[int(l)]) for l in db1.valid_lm_ids())
    o2 = sorted(int(db2.lm_num_obs[int(l)]) for l in db2.valid_lm_ids())
    assert o1 == o2
    # landmark-derived state was recomputed
    l2 = int(db2.valid_lm_ids()[0])
    assert db2.lm_max_dist[l2] > db2.lm_min_dist[l2] > 0
    assert abs(np.linalg.norm(db2.lm_normal[l2]) - 1) < 1e-4


def test_localization_on_ref_format_map(mapped_system, tmp_path):
    """The §3.5 workflow with the interop format: save as reference msgpack,
    load (auto-sniffed), relocalize and track without growing the map."""
    s, cfg, scene, poses = mapped_system
    cam = cfg.camera
    path = str(tmp_path / "ref_loc.msg")
    s.save_map_database(path, format="openvslam")

    s2 = System(cfg, vocab_path="default")
    s2.load_map_database(path)  # sniffed as reference format
    s2.disable_mapping_module()
    s2.startup()
    s2.tracker.state = TrackerState.LOST
    n_kfs = s2.map_db.n_kfs
    tracked = 0
    for i in range(8, 16):
        p = s2.feed_monocular_frame(scene.render(cam, poses[i]), 100 + i / 20.0)
        tracked += p is not None
    s2.shutdown()
    assert tracked >= 6, tracked
    assert s2.map_db.n_kfs == n_kfs
    # pose agrees with the mapping session for a common frame
    _, poses1, _ = s.tracked_poses()
    _, poses2, _ = s2.tracked_poses()
    c1 = -poses1[10][:3, :3].T @ poses1[10][:3, 3]
    c2 = -poses2[2][:3, :3].T @ poses2[2][:3, 3]
    assert np.linalg.norm(c1 - c2) < 0.1


def test_camera_spec_conversion_all_models():
    for model, extra in (
        ("perspective", {"fx": 300, "fy": 300, "cx": 160, "cy": 120,
                         "k1": -0.1, "k2": 0.01, "p1": 1e-4, "p2": -1e-4, "k3": 0.0}),
        ("fisheye", {"fx": 250, "fy": 250, "cx": 160, "cy": 120,
                     "k1": 0.02, "k2": -0.003, "k3": 1e-4, "k4": -1e-5}),
        ("equirectangular", {}),
    ):
        spec = {"model": model, "setup": "monocular", "cols": 320, "rows": 240,
                "fps": 25.0, **extra}
        ref = mc.camera_spec_to_ref(spec)
        assert ref["model_type"].lower() == model
        back = mc.camera_spec_from_ref(ref)
        assert back["model"] == model
        for k, v in extra.items():
            assert back[k] == pytest.approx(float(v))


def test_stereo_columns_roundtrip(tmp_path):
    """x_rights/depths survive the reference-format roundtrip (stereo maps)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from openvslam_tpu.config import Config
    from openvslam_tpu.data.map_database import MapDatabase
    from openvslam_tpu.camera.base import camera_to_config
    from openvslam_tpu.io.msgpack_compat import (
        save_map_openvslam, load_map_openvslam)

    cfg = Config.from_dict({
        "Camera": {"name": "st", "setup": "stereo", "model": "perspective",
                   "fx": 350.0, "fy": 350.0, "cx": 160.0, "cy": 120.0,
                   "cols": 320, "rows": 240, "fps": 20,
                   "focal_x_baseline": 40.0},
        "Feature": {"max_num_keypts": 64, "num_levels": 2},
    })
    K = 64
    db = MapDatabase(kpt_capacity=K, max_kfs=8, max_lms=64)
    db.register_camera("st", camera_to_config(cfg.camera), make_default=True)
    rng = np.random.default_rng(0)
    kf = db.n_kfs
    db.n_kfs += 1
    db.kf_valid[kf] = True
    db.kf_pose_cw[kf] = np.eye(4, dtype=np.float32)
    db.kf_timestamp[kf] = 1.25
    db.kf_src_frame[kf] = 3
    n = 10
    val = np.zeros(K, bool); val[:n] = True
    db.kf_kpt_valid[kf] = val
    db.kf_xy[kf] = rng.uniform(20, 200, (K, 2)).astype(np.float32)
    db.kf_xy_undist[kf] = db.kf_xy[kf].copy()
    db.kf_level[kf] = np.zeros(K, np.int32)
    db.kf_angle[kf] = rng.uniform(-3, 3, K).astype(np.float32)
    db.kf_desc_u32[kf] = rng.integers(0, 2**32, (K, 8), dtype=np.uint32)
    from openvslam_tpu.ops import orb
    import jax.numpy as jnp
    db.kf_desc_i8[kf] = np.asarray(orb.unpack_bits_i8(jnp.asarray(db.kf_desc_u32[kf])))
    xr = np.full(K, -1.0, np.float32); xr[:n] = rng.uniform(10, 150, n)
    dep = np.full(K, -1.0, np.float32); dep[:n] = rng.uniform(0.5, 20, n)
    db.kf_x_right[kf] = xr
    db.kf_depth[kf] = dep
    db.kf_lm_idx[kf] = np.full(K, -1, np.int32)
    db.kf_camera[kf] = "st"
    db.kf_bearing[kf] = np.zeros((K, 3), np.float32)
    db.covis[kf] = {}; db.covis_ordered[kf] = np.zeros(0, np.int32)
    db.children[kf] = set(); db.loop_edges[kf] = set()
    db.parent[kf] = -1
    db.origin_kf = kf

    path = str(tmp_path / "stereo.msg")
    save_map_openvslam(db, cfg, path)
    db2 = MapDatabase(kpt_capacity=K, max_kfs=8, max_lms=64)
    cam_j, orb_j = load_map_openvslam(db2, path)
    assert db2.n_kfs == 1
    v2 = db2.kf_kpt_valid[0].astype(bool)
    assert v2.sum() == n
    np.testing.assert_allclose(db2.kf_x_right[0][:n], xr[:n], rtol=1e-6)
    np.testing.assert_allclose(db2.kf_depth[0][:n], dep[:n], rtol=1e-6)
    np.testing.assert_array_equal(db2.kf_desc_u32[0][:n], db.kf_desc_u32[kf][:n])
    cj = next(iter(cam_j.values()))
    assert cj["setup_type"] == "Stereo"
    assert cj["focal_x_baseline"] == pytest.approx(40.0)
