import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from openvslam_tpu.data.bow import Vocabulary, BowDatabase
from openvslam_tpu.ops import bow as bow_ops


def _random_descs(rng, n):
    return (rng.random((n, 256)) > 0.5).astype(np.int8)


def test_vocab_train_and_assign(rng):
    descs = _random_descs(rng, 2000)
    vocab = Vocabulary.train(descs, num_words=64, iters=4)
    assert vocab.centers_i8.shape == (64, 256)
    words = np.asarray(bow_ops.assign_words(
        jnp.asarray(descs[:100]), jnp.asarray(vocab.centers_i8),
        jnp.ones(100, bool),
    ))
    assert words.min() >= 0 and words.max() < 64
    # identical descriptors -> identical words
    w2 = np.asarray(bow_ops.assign_words(
        jnp.asarray(descs[:100]), jnp.asarray(vocab.centers_i8),
        jnp.ones(100, bool),
    ))
    np.testing.assert_array_equal(words, w2)
    # a descriptor with a few flipped bits keeps its word most of the time
    flip = descs[:100].copy()
    for i in range(100):
        idx = rng.choice(256, 8, replace=False)
        flip[i, idx] = 1 - flip[i, idx]
    w3 = np.asarray(bow_ops.assign_words(
        jnp.asarray(flip), jnp.asarray(vocab.centers_i8), jnp.ones(100, bool)
    ))
    assert (w3 == words).mean() > 0.6


def test_bow_scoring_discriminates(rng):
    descs = _random_descs(rng, 4000)
    vocab = Vocabulary.train(descs, num_words=512, iters=4)
    db = BowDatabase(vocab)
    # "scenes" of 100 features: A, A with 20% replaced, and unrelated B
    a = descs[:100]
    a_sim = np.concatenate([descs[:80], _random_descs(rng, 20)])
    b = _random_descs(rng, 100)
    wa = db.compute_words(a, np.ones(100, bool))
    wa2 = db.compute_words(a_sim, np.ones(100, bool))
    wb = db.compute_words(b, np.ones(100, bool))
    db.add_keyframe(0, wa)
    db.add_keyframe(1, wa2)
    db.add_keyframe(2, wb)
    s_sim = db.score(0, 1)
    s_diff = db.score(0, 2)
    assert s_sim > s_diff + 0.2, (s_sim, s_diff)
    cands = db.acquire_relocalization_candidates(wa2)
    assert cands[0] in (0, 1)


@pytest.mark.slow
def test_relocalization_e2e(rng):
    """Track a sequence, lose tracking on blank frames, then relocalize on a
    revisited view."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    from openvslam_tpu.system import System
    from openvslam_tpu.module.tracking_module import TrackerState
    from openvslam_tpu.utils import synthetic

    cfg = _make_config()
    cam = cfg.camera
    scene = synthetic.PatchSceneRenderer(
        rng, n_points=700, center=(0, 0, 6), extent=(6, 4.5, 2.5),
        rows=cam.rows, cols=cam.cols,
    )
    poses_gt = synthetic.orbit_trajectory(30, radius=2.5, target=(0, 0, 6), arc=np.pi / 4)
    s = System(cfg, vocab_path="default")
    s.startup()
    for i in range(30):
        s.feed_monocular_frame(scene.render(cam, poses_gt[i]), i / 20.0)
    assert s.tracker.state == TrackerState.TRACKING
    # blank frames -> lost
    blank = np.zeros((cam.rows, cam.cols), np.uint8)
    for i in range(3):
        out = s.feed_monocular_frame(blank, (30 + i) / 20.0)
    assert s.tracker.state == TrackerState.LOST
    # revisit an early view -> relocalize
    reloc_pose = None
    for attempt in range(3):
        reloc_pose = s.feed_monocular_frame(
            scene.render(cam, poses_gt[5]), (33 + attempt) / 20.0
        )
        if reloc_pose is not None:
            break
    s.shutdown()
    assert reloc_pose is not None, "relocalization failed"
    # pose close to ground truth frame 5 (up to mono scale: compare direction)
    est_c = -reloc_pose[:3, :3].T @ reloc_pose[:3, 3]
    # compare against the system's own earlier estimate of frame 5
    ts, poses, mask = s.tracked_poses()
    ref_pose = poses[5]
    ref_c = -ref_pose[:3, :3].T @ ref_pose[:3, 3]
    assert np.linalg.norm(est_c - ref_c) < 0.15
    assert np.linalg.norm(reloc_pose[:3, :3] - ref_pose[:3, :3]) < 0.1
