"""Live web viewer (ref socket_publisher + web app): serve a running session
over HTTP and check the page, state.json, and frame.png endpoints."""
import json
import urllib.request

import numpy as np

from openvslam_tpu.config import Config
from openvslam_tpu.publish.socket_viewer import SocketViewer, encode_png
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_png_encoder_roundtrip_header():
    img = (np.arange(40 * 30) % 256).astype(np.uint8).reshape(30, 40)
    png = encode_png(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR dims big-endian at offset 16
    assert int.from_bytes(png[16:20], "big") == 40
    assert int.from_bytes(png[20:24], "big") == 30
    rgb = np.zeros((5, 7, 3), np.uint8)
    assert encode_png(rgb)[:8] == b"\x89PNG\r\n\x1a\n"


def test_live_viewer_serves_session():
    rows, cols = 240, 320
    cfg = Config.from_dict({
        "Camera": {
            "name": "t", "setup": "monocular", "model": "perspective",
            "fx": 260.0, "fy": 260.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": 400, "num_levels": 3, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(3)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=500, center=(0, 0, 6), extent=(5, 4, 2),
        rows=rows, cols=cols,
    )
    poses = synthetic.orbit_trajectory(12, radius=2.0, target=(0, 0, 6),
                                       arc=np.pi / 6)
    sys_ = System(cfg)
    sys_.startup()
    viewer = SocketViewer(sys_, port=0).start()   # port=0: pick a free port
    try:
        for i in range(12):
            sys_.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)

        status, ctype, body = _get(viewer.url)
        assert status == 200 and "html" in ctype and b"openvslam_tpu" in body

        status, ctype, body = _get(viewer.url + "state.json")
        assert status == 200
        state = json.loads(body)
        assert state["stats"]["frame_id"] == 11
        assert len(state["kf_centers"]) == len(sys_.map_db.valid_kf_ids())
        assert state["stats"]["n_landmarks"] == len(sys_.map_db.valid_lm_ids())
        assert state["cur"] is not None and len(state["cur"]) == 3

        status, ctype, body = _get(viewer.url + "frame.png")
        assert status == 200 and ctype == "image/png"
        assert int.from_bytes(body[16:20], "big") == cols
        assert int.from_bytes(body[20:24], "big") == rows

        # control plane (ref viewer UI panel)
        _, _, body = _get(viewer.url + "control?cmd=toggle_mapping")
        assert json.loads(body)["mapping"] is False
        _, _, body = _get(viewer.url + "control?cmd=toggle_mapping")
        assert json.loads(body)["mapping"] is True
        _, _, body = _get(viewer.url + "control?cmd=toggle_loop")
        st = json.loads(body)
        assert st["ok"]
        _, _, body = _get(viewer.url + "control?cmd=terminate")
        assert json.loads(body)["terminate"] is True
        _, _, body = _get(viewer.url + "control?cmd=bogus")
        assert json.loads(body)["ok"] is False
    finally:
        viewer.stop()
        sys_.shutdown()


def test_autosave_snapshots(tmp_path):
    rows, cols = 240, 320
    cfg = Config.from_dict({
        "Camera": {
            "name": "t", "setup": "monocular", "model": "perspective",
            "fx": 260.0, "fy": 260.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": 400, "num_levels": 3, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(4)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=500, center=(0, 0, 6), extent=(5, 4, 2),
        rows=rows, cols=cols,
    )
    poses = synthetic.orbit_trajectory(14, radius=2.0, target=(0, 0, 6),
                                       arc=np.pi / 5)
    snap = tmp_path / "auto.msg"
    s = System(cfg)
    s.enable_autosave(str(snap), every_n_keyframes=2)
    s.startup()
    for i in range(14):
        s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
    t = getattr(s, "_autosave_thread", None)
    if t is not None:
        t.join(timeout=60)
    s.shutdown()
    assert snap.exists(), "no autosave written"
    s2 = System(cfg)
    s2.load_map_database(str(snap))
    assert s2.map_db.n_kfs >= 2
    assert len(s2.map_db.valid_lm_ids()) > 50


def test_playback_pause_step_controls():
    """Playback control plane (ref pangolin_viewer pause/step): 'step' lets
    exactly one frame through a paused feed loop; terminate unblocks it."""
    import threading
    import time

    from openvslam_tpu.publish.socket_viewer import SocketViewer

    class _Sys:   # control() only touches these on unknown/playback cmds
        mapping_enabled = True

        def loop_detector_is_enabled(self):
            return False

    v = SocketViewer(_Sys())
    assert v.wait_if_paused() is True          # not paused: passes through

    out = v.control("playback")
    assert out["ok"] and out["playback_paused"]
    passed = []
    t = threading.Thread(target=lambda: passed.append(v.wait_if_paused()))
    t.start()
    time.sleep(0.15)
    assert not passed, "feed loop ran through a paused viewer"
    v.control("step")
    t.join(timeout=5)
    assert passed == [True]

    # still paused after the step; terminate unblocks and stops the loop
    t2 = threading.Thread(target=lambda: passed.append(v.wait_if_paused()))
    t2.start()
    time.sleep(0.15)
    v.control("terminate")
    t2.join(timeout=5)
    assert passed == [True, False]
