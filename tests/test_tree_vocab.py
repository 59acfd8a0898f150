"""Hierarchical (DBoW2-style) vocabulary tree: training, greedy descent,
direct index, IO roundtrip, and drop-in use in the BoW database.

Parity target: reference ``data/bow_vocabulary`` (k-branch/L-level tree,
greedy per-descriptor descent, direct index at an intermediate level used by
match::bow_tree) — SURVEY.md §2.1.
"""
import numpy as np
import pytest

from openvslam_tpu.data.bow import (
    BowDatabase, TreeVocabulary, Vocabulary, load_vocabulary,
)
from openvslam_tpu.ops import bow as bow_ops


def _rand_descs(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, 256)) < 0.5).astype(np.int8)


def _greedy_descent_np(desc, vocab):
    """Reference-style greedy descent in plain numpy."""
    node = 0
    d = desc.astype(np.int64)
    for C, V in zip(vocab.level_centers, vocab.level_valid):
        lo = node * vocab.k
        best_j, best_dist = 0, 1 << 40
        for j in range(vocab.k):
            if not V[lo + j]:
                continue
            dist = int(np.sum(d != C[lo + j].astype(np.int64)))
            if dist < best_dist:
                best_j, best_dist = j, dist
        node = node * vocab.k + best_j
    return node


def test_train_and_assign_matches_numpy_descent():
    descs = _rand_descs(600, seed=1)
    vocab = TreeVocabulary.train(descs, k=4, levels=3, iters=4, seed=0)
    assert vocab.num_words == 64
    words = vocab.assign(descs[:50], np.ones(50, bool))
    expected = np.array([_greedy_descent_np(descs[i], vocab) for i in range(50)])
    np.testing.assert_array_equal(words, expected)
    # invalid descriptors map to -1
    valid = np.ones(50, bool)
    valid[::7] = False
    words2 = vocab.assign(descs[:50], valid)
    assert (words2[~valid] == -1).all()
    np.testing.assert_array_equal(words2[valid], expected[valid])


def test_training_descriptors_land_in_nonempty_leaves():
    descs = _rand_descs(400, seed=2)
    vocab = TreeVocabulary.train(descs, k=3, levels=3, iters=4, seed=1)
    words = vocab.assign(descs, np.ones(len(descs), bool))
    assert (words >= 0).all() and (words < vocab.num_words).all()
    # idf is finite and favors rare words
    assert np.isfinite(vocab.idf).all()
    counts = np.bincount(words, minlength=vocab.num_words)
    seen = counts > 0
    assert (vocab.idf[seen] <= np.log(len(descs)) + 1e-6).all()


def test_node_at_level_direct_index():
    descs = _rand_descs(300, seed=3)
    vocab = TreeVocabulary.train(descs, k=4, levels=3, iters=3, seed=0)
    words = vocab.assign(descs[:32], np.ones(32, bool))
    for level in (1, 2, 3):
        anc = np.asarray(vocab.node_at_level(words, level))
        assert (anc < vocab.k ** level).all()
        # ancestor is a prefix: descending further from it reaches the leaf
        np.testing.assert_array_equal(
            words // vocab.k ** (vocab.levels - level), anc)
    # -1 stays -1
    w = np.array([-1, 5, -1])
    anc = np.asarray(vocab.node_at_level(w, 1))
    assert anc[0] == -1 and anc[2] == -1


def test_io_roundtrip_and_dispatch(tmp_path):
    descs = _rand_descs(300, seed=4)
    vocab = TreeVocabulary.train(descs, k=4, levels=2, iters=3, seed=0)
    p = str(tmp_path / "tree_vocab.npz")
    vocab.save(p)
    # Vocabulary.load dispatches on the tree marker
    v2 = load_vocabulary(p)
    assert isinstance(v2, TreeVocabulary)
    assert v2.k == vocab.k and v2.levels == vocab.levels
    words1 = vocab.assign(descs[:20], np.ones(20, bool))
    words2 = v2.assign(descs[:20], np.ones(20, bool))
    np.testing.assert_array_equal(words1, words2)
    np.testing.assert_allclose(v2.idf, vocab.idf)
    # flat file still loads as flat
    flat = Vocabulary.train(descs, num_words=16, iters=2)
    pf = str(tmp_path / "flat.npz")
    flat.save(pf)
    assert isinstance(load_vocabulary(pf), Vocabulary)


def test_bow_database_with_tree_vocab():
    """TreeVocabulary drops into BowDatabase: add/query/score/reloc cands."""
    descs = _rand_descs(800, seed=5)
    vocab = TreeVocabulary.train(descs, k=4, levels=3, iters=3, seed=0)
    db = BowDatabase(vocab)
    rng = np.random.default_rng(6)
    # three keyframes with distinct descriptor sets, one similar to the query
    base = descs[:100]
    for kf, d in enumerate([base, descs[200:300], descs[400:500]]):
        words = db.compute_words(d.astype(np.int8), np.ones(len(d), bool))
        db.add_keyframe(kf, words)
    # query = keyframe 0's descriptors with a few bit flips
    q = base.copy()
    flips = rng.integers(0, 256, size=(len(q), 4))
    for i in range(len(q)):
        q[i, flips[i]] ^= 1
    qwords = db.compute_words(q.astype(np.int8), np.ones(len(q), bool))
    cands = db.acquire_relocalization_candidates(qwords)
    assert cands and cands[0] == 0
    v = db.bow_vec(qwords)
    assert db.score_vec(v, 0) > db.score_vec(v, 1)
    assert db.score_vec(v, 0) > db.score_vec(v, 2)


def test_gate_words_widens_for_tree_vocab():
    """gate_words: identity for flat vocab, direct-index ancestor for tree —
    so bow_tree gating admits all pairs sharing an ancestor node."""
    descs = _rand_descs(500, seed=8)
    flat = Vocabulary.train(descs, num_words=32, iters=2)
    np.testing.assert_array_equal(
        BowDatabase(flat).gate_words(np.array([3, -1, 7])), [3, -1, 7])

    tree = TreeVocabulary.train(descs, k=4, levels=3, iters=3, seed=0)
    db = BowDatabase(tree)
    words = tree.assign(descs[:64], np.ones(64, bool))
    gated = db.gate_words(words)
    # ancestor at level L-2 = leaf // k**2
    np.testing.assert_array_equal(gated, words // (tree.k ** 2))
    assert len(np.unique(gated)) <= len(np.unique(words))
    # invalid stays invalid
    w = words.copy()
    w[0] = -1
    assert db.gate_words(w)[0] == -1


def test_small_training_sets_stay_consistent():
    """Fewer descriptors than leaves: descent must still end at valid leaves."""
    descs = _rand_descs(10, seed=7)
    vocab = TreeVocabulary.train(descs, k=4, levels=3, iters=2, seed=0)
    words = vocab.assign(descs, np.ones(len(descs), bool))
    assert (words >= 0).all() and (words < vocab.num_words).all()
    # every reachable leaf is marked valid
    leaf_valid = vocab.level_valid[-1]
    assert leaf_valid[np.unique(words)].all()
