"""Logging taxonomy (ref: spdlog events throughout; SURVEY.md §5.5)."""
import logging

import numpy as np
import pytest

from openvslam_tpu.config import Config
from openvslam_tpu.system import System
from openvslam_tpu.utils import synthetic
from openvslam_tpu.utils.log import enable_console, get_logger


def test_namespaced_logger_and_console():
    log = get_logger("x")
    assert log.name == "openvslam_tpu.x"
    root = logging.getLogger("openvslam_tpu")
    prev_level = root.level
    prev_handlers = list(root.handlers)
    try:
        enable_console(debug=True)
        assert root.level == logging.DEBUG
        enable_console(debug=True)  # idempotent: no duplicate handlers
        n_stream = sum(
            1 for h in root.handlers
            if isinstance(h, logging.StreamHandler)
            and not isinstance(h, logging.NullHandler)
        )
        assert n_stream == 1
    finally:
        # don't leak a DEBUG stream handler into the rest of the session
        for h in list(root.handlers):
            if h not in prev_handlers:
                root.removeHandler(h)
        root.setLevel(prev_level)


def test_slam_events_logged(caplog):
    cfg = Config.from_dict({
        "Camera": {"name": "s", "setup": "monocular", "model": "perspective",
                   "fx": 350.0, "fy": 350.0, "cx": 208.0, "cy": 160.0,
                   "cols": 416, "rows": 320, "fps": 20},
        "Feature": {"max_num_keypts": 600, "num_levels": 4,
                    "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(11)
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=700, center=(0, 0, 6), extent=(6, 4.5, 2.5),
        rows=320, cols=416,
    )
    poses = synthetic.orbit_trajectory(12, radius=2.5, target=(0, 0, 6),
                                       arc=np.pi / 12)
    with caplog.at_level(logging.DEBUG, logger="openvslam_tpu"):
        s = System(cfg)
        s.startup()
        for i in range(12):
            s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
        s.shutdown()
    text = caplog.text
    assert "system startup" in text
    assert "initialized map" in text
    assert "keyframe" in text and "inserted" in text
    assert "system shutdown" in text
