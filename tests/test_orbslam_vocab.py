"""ORB-SLAM-format text vocabulary IO (data/bow.py): roundtrip identity of
word assignment, imbalanced-branch handling, and System-level loading."""
import numpy as np
import pytest

from openvslam_tpu.data import bow


@pytest.fixture(scope="module")
def tree_vocab():
    rng = np.random.default_rng(0)
    descs = rng.integers(0, 2, (2000, 256)).astype(np.int8)
    return bow.TreeVocabulary.train(descs, k=3, levels=3, iters=4), descs


def test_text_roundtrip_assignments(tree_vocab, tmp_path):
    tv, descs = tree_vocab
    path = str(tmp_path / "voc.txt")
    bow.save_orbslam_text(tv, path)
    tv2 = bow.load_orbslam_text(path)
    assert (tv2.k, tv2.levels) == (tv.k, tv.levels)
    rng = np.random.default_rng(1)
    q = rng.integers(0, 2, (500, 256)).astype(np.int8)
    v = np.ones(500, bool)
    np.testing.assert_array_equal(tv.assign(q, v), tv2.assign(q, v))
    # idf weights of assigned words survive
    w = tv.assign(q, v)
    np.testing.assert_allclose(tv.idf[w], tv2.idf[w], rtol=1e-6)


def test_text_format_shape(tree_vocab, tmp_path):
    tv, _ = tree_vocab
    path = str(tmp_path / "voc2.txt")
    bow.save_orbslam_text(tv, path)
    with open(path) as f:
        k, L, s_, w_ = f.readline().split()
        assert (int(k), int(L)) == (tv.k, tv.levels)
        line = f.readline().split()
        # parent id, is_leaf, 32 bytes, weight
        assert len(line) == 35
        assert line[0] == "0"
        assert all(0 <= int(v) <= 255 for v in line[2:34])


def test_imbalanced_leaf_propagation(tmp_path):
    """A leaf above the bottom level must still quantize via greedy descent."""
    path = str(tmp_path / "imb.txt")
    rng = np.random.default_rng(3)
    d0 = rng.integers(0, 2, 256)
    d1 = rng.integers(0, 2, 256)
    by0 = " ".join(str(int(v)) for v in np.packbits(d0.astype(np.uint8), bitorder="little"))
    by1 = " ".join(str(int(v)) for v in np.packbits(d1.astype(np.uint8), bitorder="little"))
    with open(path, "w") as f:
        f.write("2 2 0 0\n")
        f.write(f"0 1 {by0} 1.5\n")        # node 1: LEAF at level 0 (early)
        f.write(f"0 0 {by1} 0.0\n")        # node 2: interior at level 0
        f.write(f"2 1 {by1} 2.0\n")        # node 3: leaf at level 1
    tv = bow.load_orbslam_text(path)
    q = np.stack([d0, d1]).astype(np.int8)
    w = tv.assign(q, np.ones(2, bool))
    assert w[0] != w[1]
    assert tv.idf[w[0]] == pytest.approx(1.5)
    assert tv.idf[w[1]] == pytest.approx(2.0)


def test_system_loads_text_vocab(tmp_path, tree_vocab):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracking_e2e import _make_config
    from openvslam_tpu.system import System

    tv, _ = tree_vocab
    path = str(tmp_path / "voc3.txt")
    bow.save_orbslam_text(tv, path)
    cfg = _make_config()
    s = System(cfg, vocab_path=path)
    assert isinstance(s.global_optimizer.bow_db.vocab, bow.TreeVocabulary)
