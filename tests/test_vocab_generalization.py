"""Vocabulary realism (VERDICT r2 next-#4): the shipped large tree
vocabulary is trained on one family of synthetic textures
(tools/train_vocab.py --synthetic); these tests evaluate it on scenes
rendered with DIFFERENT texture statistics (held-out octave families,
no salt-and-pepper dots), so place-recognition quality is not
self-confirming.  Plus binary .dbow2 and text format interop.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from openvslam_tpu.camera import Perspective
from openvslam_tpu.data.bow import (
    BowDatabase, TreeVocabulary, load_dbow2_binary, load_orbslam_text,
    load_vocabulary, save_dbow2_binary, save_orbslam_text,
)
from openvslam_tpu.models.frontend import OrbFrontend
from openvslam_tpu.utils import synthetic

ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "assets", "vocab_tree_k8L5.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ASSET), reason="large tree vocabulary not trained")

# held-out rendering: octave family NOT in tools/train_vocab.py's list,
# dots disabled (training mostly used dots)
HELDOUT_OCTAVES = ((3, 0.9), (12, 0.5), (40, 1.0), (80, 0.25))


@pytest.fixture(scope="module")
def vocab():
    return load_vocabulary(ASSET)


@pytest.fixture(scope="module")
def heldout_frames():
    cam = Perspective.create(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                             cols=320, rows=240)
    fe = OrbFrontend(rows=240, cols=320, max_keypts=500, num_levels=3)
    rng = np.random.default_rng(99)
    scene = synthetic.RoomSceneRenderer(
        rng, half=10.0, rows=240, cols=320, n_walls=8,
        octaves=HELDOUT_OCTAVES, dots=False)
    poses = synthetic.lap_trajectory(12, radius=6.0, laps=1.0)
    frames = []
    for i in range(12):
        kp = fe.extract(jnp.asarray(scene.render(cam, poses[i])))
        frames.append((np.asarray(kp.desc_i8), np.asarray(kp.valid)))
    # revisit of pose 3 from a slightly perturbed viewpoint
    jit = poses[3].copy()
    jit[:3, 3] += np.array([0.05, 0.02, -0.04])
    kp = fe.extract(jnp.asarray(scene.render(cam, jit)))
    revisit = (np.asarray(kp.desc_i8), np.asarray(kp.valid))
    return frames, revisit


def test_tree_vocab_shape(vocab):
    assert isinstance(vocab, TreeVocabulary)
    assert vocab.k == 8 and vocab.levels == 5
    assert vocab.num_words == 8 ** 5
    # a real fraction of the tree must be populated
    assert vocab.level_valid[-1].sum() > 2000


def test_heldout_place_recognition(vocab, heldout_frames):
    """Same place under different texture statistics must outscore every
    different place (the reference's min-score/loop gate semantics)."""
    frames, revisit = heldout_frames
    db = BowDatabase(vocab)
    for i, (d, v) in enumerate(frames):
        db.add_keyframe(i, db.compute_words(d, v))
    w = db.compute_words(*revisit)
    v = db.bow_vec(w)
    scores = np.array([db.score_vec(v, i) for i in range(len(frames))])
    same = scores[3]
    # neighbors on the lap overlap visually; exclude pose 2-4 from "other"
    others = np.concatenate([scores[:2], scores[5:]])
    assert same > others.max(), (same, others.max())
    # and the reloc query must return the right keyframe first
    cands = db.acquire_relocalization_candidates(w)
    assert cands and cands[0] in (2, 3, 4), cands


def test_heldout_word_spread(vocab, heldout_frames):
    """Held-out descriptors should spread over many words — a vocabulary
    that funnels unseen textures into few words has memorized its training
    distribution."""
    frames, _ = heldout_frames
    d, v = frames[0]
    words = vocab.assign(d, v)
    words = words[words >= 0]
    assert len(np.unique(words)) > 0.4 * len(words), (
        len(np.unique(words)), len(words))


def test_dbow2_binary_roundtrip(tmp_path, vocab):
    p = str(tmp_path / "v.dbow2")
    save_dbow2_binary(vocab, p)
    v2 = load_dbow2_binary(p)
    assert v2.k == vocab.k and v2.levels == vocab.levels
    for a, b in zip(vocab.level_centers, v2.level_centers):
        assert np.array_equal(a, b)
    for a, b in zip(vocab.level_valid, v2.level_valid):
        assert np.array_equal(a, b)
    # idf carries meaning only at reachable (valid) leaf slots; the file
    # stores exactly those
    leaf_ok = vocab.level_valid[-1]
    assert np.allclose(vocab.idf[leaf_ok], v2.idf[leaf_ok], atol=1e-6)


def test_dbow2_binary_matches_text(tmp_path):
    """The binary and text formats encode the same tree: write both from
    one vocabulary, read both back, quantization must agree exactly."""
    rng = np.random.default_rng(5)
    descs = rng.integers(0, 2, (4000, 256)).astype(np.int8)
    v = TreeVocabulary.train(descs, k=4, levels=3, iters=4)
    pb = str(tmp_path / "v.dbow2")
    pt = str(tmp_path / "v.txt")
    save_dbow2_binary(v, pb)
    save_orbslam_text(v, pt)
    vb = load_dbow2_binary(pb)
    vt = load_orbslam_text(pt)
    q = rng.integers(0, 2, (512, 256)).astype(np.int8)
    val = np.ones(512, bool)
    wb = vb.assign(q, val)
    wt = vt.assign(q, val)
    assert np.array_equal(wb, wt)
    assert np.array_equal(v.assign(q, val), wb)
