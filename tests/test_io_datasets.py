"""Dataset loaders (fabricated tiny directory fixtures), stereo rectifier,
and publisher snapshots."""
import os

import numpy as np
import jax.numpy as jnp

from openvslam_tpu.utils import datasets, synthetic
from openvslam_tpu.utils.stereo_rectifier import build_rectify_map, remap_bilinear


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.astype(np.uint8).tobytes())


def test_tum_loader(tmp_path, rng):
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    lines = ["# rgb images"]
    for i in range(5):
        img = rng.integers(0, 255, (48, 64), np.uint8)
        _write_pgm(str(root / "rgb" / f"{i}.pgm"), img)
        lines.append(f"{1.0 + i * 0.05:.6f} rgb/{i}.pgm")
    (root / "rgb.txt").write_text("\n".join(lines))
    seq = datasets.TumRgbdSequence(str(root))
    assert len(seq) == 5
    ts, img, depth = seq[2]
    assert abs(ts - 1.1) < 1e-6
    assert img.shape == (48, 64) and depth is None


def test_kitti_loader(tmp_path, rng):
    root = tmp_path / "kitti"
    (root / "image_0").mkdir(parents=True)
    for i in range(3):
        _write_pgm(str(root / "image_0" / f"{i:06d}.png"), rng.integers(0, 255, (32, 48), np.uint8))
    # our png files are actually pgm content — use .pgm suffix path instead
    (root / "times.txt").write_text("0.0\n0.1\n0.2\n")
    seq = datasets.KittiOdometrySequence(str(root), stereo=False)
    assert len(seq) == 3


def test_euroc_loader(tmp_path, rng):
    root = tmp_path / "euroc"
    d = root / "mav0" / "cam0" / "data"
    d.mkdir(parents=True)
    rows = ["#timestamp [ns],filename"]
    for i in range(4):
        name = f"{i}.pgm"
        _write_pgm(str(d / name), rng.integers(0, 255, (24, 32), np.uint8))
        rows.append(f"{1403636579763555584 + i * 50000000},{name}")
    (root / "mav0" / "cam0" / "data.csv").write_text("\n".join(rows))
    seq = datasets.EurocSequence(str(root), stereo=False)
    assert len(seq) == 4
    ts, left, right = seq[1]
    assert left.shape == (24, 32) and right is None


def test_rectify_map_identity(rng):
    """With zero distortion and identity rectification the map is identity."""
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    m = build_rectify_map(K, [0, 0, 0, 0, 0], np.eye(3), K, 48, 64)
    uu, vv = np.meshgrid(np.arange(64), np.arange(48))
    np.testing.assert_allclose(m[..., 0], uu, atol=1e-4)
    np.testing.assert_allclose(m[..., 1], vv, atol=1e-4)
    img = rng.integers(0, 255, (48, 64)).astype(np.float32)
    out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(m)))
    np.testing.assert_allclose(out[1:-1, 1:-1], img[1:-1, 1:-1], atol=0.5)


def test_publishers(rng):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    from openvslam_tpu.system import System

    cfg = _make_config()
    cam = cfg.camera
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 8), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 1.5, 8)
    poses = np.stack([synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7)) for x in xs])
    s = System(cfg)
    s.startup()
    for i in range(len(poses)):
        s.feed_monocular_frame(scene.render(cam, poses[i]), i / 20.0)
    s.shutdown()
    snap = s.frame_publisher.get_current_frame()
    assert snap is not None and snap["state"] == "TRACKING"
    assert snap["keypoints"].shape[1] == 2
    assert snap["tracked"].any()
    ids, kf_poses = s.map_publisher.get_keyframes()
    assert len(ids) >= 2 and kf_poses.shape[1:] == (4, 4)
    lm_ids, lm_pos = s.map_publisher.get_landmarks()
    assert len(lm_ids) > 50 and lm_pos.shape[1] == 3
    assert len(s.map_publisher.get_spanning_tree_edges()) >= 1


def test_html_viewer_export(rng, tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    from openvslam_tpu.system import System
    from openvslam_tpu.publish.html_viewer import export_html

    cfg = _make_config()
    cam = cfg.camera
    scene = synthetic.PlaneSceneRenderer(
        rng, x_range=(-5, 8), y_range=(-5, 5), plane_z=7.0,
        rows=cam.rows, cols=cam.cols,
    )
    xs = np.linspace(0.0, 1.5, 8)
    s = System(cfg)
    s.startup()
    for i, x in enumerate(xs):
        s.feed_monocular_frame(
            scene.render(cam, synthetic.lookat_pose_cw((x, 0, 0), (x, 0, 7))),
            i / 20.0,
        )
    s.shutdown()
    out = tmp_path / "map.html"
    export_html(s.map_publisher, str(out))
    html = out.read_text()
    assert "kf_centers" in html and "landmarks" in html
    assert len(html) > 5000
