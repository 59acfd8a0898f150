"""Vocabulary training + BoW database (host side).

Replaces ``data/bow_vocabulary`` (DBoW2 wrapper) and ``data/bow_database``
(inverted index; SURVEY.md §2.1).  Two vocabulary forms:

- ``Vocabulary`` (default): a flat set of W binary word centers trained by
  k-medians (bit-majority) — FBoW-style binary clustering; assignment is
  exact nearest-word (one MXU Hamming matmul + argmin).
- ``TreeVocabulary``: the reference's hierarchical k-branch/L-level DBoW2
  tree with greedy descent and direct-index-at-level semantics, stored
  level-major so descent is L static device stages.

Training data: any stack of packed/unpacked ORB descriptors; a
deterministic synthetic-scene vocabulary is built on demand when no file is
given (no network => no pretrained ~40MB DBoW2 file; see SURVEY.md §7 hard
part 6).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Set

import numpy as np

from ..ops import bow as bow_ops


class Vocabulary:
    def __init__(self, centers_i8: np.ndarray, idf: Optional[np.ndarray] = None):
        self.centers_i8 = centers_i8.astype(np.int8)          # (W,256) in {0,1}
        self.num_words = centers_i8.shape[0]
        self.idf = (idf if idf is not None
                    else np.ones(self.num_words, np.float32))

    def assign(self, desc_i8, valid) -> np.ndarray:
        """(K,256) descriptors -> (K,) word ids (-1 invalid); exact
        nearest-word quantization (one MXU Hamming matmul + argmin)."""
        import jax.numpy as jnp
        return np.asarray(bow_ops.assign_words(
            jnp.asarray(desc_i8), jnp.asarray(self.centers_i8),
            jnp.asarray(valid),
        ))

    def assign_batch(self, desc_b, valid_b) -> np.ndarray:
        """(B,K,256) -> (B,K) word ids in ONE device call."""
        import jax.numpy as jnp
        return np.asarray(bow_ops.assign_words_batch(
            jnp.asarray(desc_b), jnp.asarray(self.centers_i8),
            jnp.asarray(valid_b),
        ))

    def gate_ids(self, words: np.ndarray) -> np.ndarray:
        """Ids used for match gating (ref match::bow_tree direct index).
        Flat vocabulary: the words themselves."""
        return words

    def save(self, path: str):
        np.savez_compressed(path, centers=self.centers_i8, idf=self.idf)

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        z = np.load(path)
        if "tree_k" in z:
            return TreeVocabulary._from_npz(z)
        return cls(z["centers"], z["idf"])

    @classmethod
    def train(cls, descs_i8: np.ndarray, num_words: int = 1024,
              iters: int = 8, seed: int = 0) -> "Vocabulary":
        """k-medians on binary descriptors: assignment by Hamming distance,
        centers updated by per-bit majority vote."""
        rng = np.random.default_rng(seed)
        n = descs_i8.shape[0]
        assert n >= num_words, "need more training descriptors than words"
        centers = descs_i8[rng.choice(n, num_words, replace=False)].astype(np.int8)
        d = descs_i8.astype(np.int32)
        for _ in range(iters):
            # Hamming via dot: d and centers in {0,1}
            dots = d @ centers.astype(np.int32).T
            na = d.sum(-1, keepdims=True)
            nb = centers.astype(np.int32).sum(-1)[None, :]
            dist = na + nb - 2 * dots
            assign = dist.argmin(-1)
            for w in range(num_words):
                members = d[assign == w]
                if len(members) == 0:
                    centers[w] = d[rng.integers(0, n)]
                else:
                    centers[w] = (members.mean(0) > 0.5).astype(np.int8)
        # idf from the training distribution
        dots = d @ centers.astype(np.int32).T
        na = d.sum(-1, keepdims=True)
        nb = centers.astype(np.int32).sum(-1)[None, :]
        assign = (na + nb - 2 * dots).argmin(-1)
        counts = np.bincount(assign, minlength=num_words).astype(np.float64)
        idf = np.log(n / np.maximum(counts, 1.0)).astype(np.float32)
        return cls(centers, idf)


class TreeVocabulary:
    """Hierarchical k-branch / L-level binary vocabulary (DBoW2-style).

    Parity with the reference's ``data/bow_vocabulary`` (a DBoW2-fork tree
    descended greedily per descriptor; SURVEY.md §2.1): same k/L tree shape,
    same greedy-descent quantization, same direct-index-at-level semantics
    (``node_at_level``).  Storage is level-major dense arrays so descent is
    L static gather+Hamming-argmin stages on device (ops/bow.py
    ``tree_assign_words``) — no pointer chasing.  The flat ``Vocabulary``
    remains the default (exact quantization, one matmul); this class exists
    for reference-faithful behavior and for large vocabularies where k*L
    comparisons beat k**L.
    """

    def __init__(self, level_centers, level_valid, k: int,
                 idf: Optional[np.ndarray] = None):
        self.level_centers = [c.astype(np.int8) for c in level_centers]
        self.level_valid = [v.astype(bool) for v in level_valid]
        self.k = int(k)
        self.levels = len(self.level_centers)
        self.num_words = self.k ** self.levels
        self.idf = (idf if idf is not None
                    else np.ones(self.num_words, np.float32))
        # leaf centers view, for code that wants a flat (W,256) table
        self.centers_i8 = self.level_centers[-1]

    # ------------------------------------------------------------------
    def assign(self, desc_i8, valid) -> np.ndarray:
        import jax.numpy as jnp
        return np.asarray(bow_ops.tree_assign_words(
            jnp.asarray(desc_i8), jnp.asarray(valid),
            tuple(jnp.asarray(c) for c in self.level_centers),
            tuple(jnp.asarray(v) for v in self.level_valid),
            self.k,
        ))

    def assign_batch(self, desc_b, valid_b) -> np.ndarray:
        """(B,K,256) -> (B,K) leaf word ids in ONE device call."""
        import jax.numpy as jnp
        return np.asarray(bow_ops.tree_assign_words_batch(
            jnp.asarray(desc_b), jnp.asarray(valid_b),
            tuple(jnp.asarray(c) for c in self.level_centers),
            tuple(jnp.asarray(v) for v in self.level_valid),
            self.k,
        ))

    def node_at_level(self, words: np.ndarray, level: int) -> np.ndarray:
        """Direct index: level-``level`` ancestor of each leaf word id."""
        return bow_ops.node_at_level(words, self.k, self.levels, level)

    def gate_ids(self, words: np.ndarray) -> np.ndarray:
        """Match-gating ids: the direct-index ancestor two levels above the
        leaves (DBoW2's default di_levels placement), widening bow_tree
        candidate sets exactly as the reference does."""
        return np.asarray(self.node_at_level(
            words, max(1, self.levels - 2)))

    # ------------------------------------------------------------------
    def save(self, path: str):
        """Centers are bit-packed on disk (32 bytes/node vs 256): a 32k-leaf
        tree stays ~1.5 MB instead of ~10 MB."""
        payload = {"tree_k": np.int64(self.k), "idf": self.idf,
                   "packed": np.int64(1)}
        for i, (c, v) in enumerate(zip(self.level_centers, self.level_valid)):
            payload[f"centers_{i}"] = np.packbits(
                c.astype(np.uint8), axis=-1, bitorder="little")
            payload[f"valid_{i}"] = v
        np.savez_compressed(path, **payload)

    @classmethod
    def _from_npz(cls, z) -> "TreeVocabulary":
        k = int(z["tree_k"])
        packed = "packed" in z and int(z["packed"])
        centers, valid = [], []
        i = 0
        while f"centers_{i}" in z:
            c = z[f"centers_{i}"]
            if packed:
                c = np.unpackbits(c, axis=-1, bitorder="little")[..., :256]
            centers.append(c.astype(np.int8))
            valid.append(z[f"valid_{i}"])
            i += 1
        return cls(centers, valid, k, z["idf"])

    @classmethod
    def load(cls, path: str) -> "TreeVocabulary":
        v = Vocabulary.load(path)
        assert isinstance(v, cls), f"{path} holds a flat vocabulary"
        return v

    # ------------------------------------------------------------------
    @classmethod
    def train(cls, descs_i8: np.ndarray, k: int = 8, levels: int = 3,
              iters: int = 8, seed: int = 0) -> "TreeVocabulary":
        """Recursive k-medians: cluster into k groups, recurse per branch
        (the DBoW2 training scheme on binary descriptors)."""
        rng = np.random.default_rng(seed)
        d = descs_i8.astype(np.int32)
        level_centers = [np.zeros((k ** (l + 1), 256), np.int8)
                         for l in range(levels)]
        level_valid = [np.zeros(k ** (l + 1), bool) for l in range(levels)]

        def kmedians(sub: np.ndarray):
            """(n,256) -> (centers (<=k,256) i8, assign (n,))"""
            n = sub.shape[0]
            kk = min(k, n)
            centers = sub[rng.choice(n, kk, replace=False)]
            for _ in range(iters):
                dots = sub @ centers.T
                dist = sub.sum(-1, keepdims=True) + centers.sum(-1)[None] \
                    - 2 * dots
                assign = dist.argmin(-1)
                for w in range(kk):
                    members = sub[assign == w]
                    if len(members):
                        centers[w] = (members.mean(0) > 0.5).astype(np.int32)
                    else:
                        centers[w] = sub[rng.integers(0, n)]
            dots = sub @ centers.T
            dist = sub.sum(-1, keepdims=True) + centers.sum(-1)[None] - 2 * dots
            return centers.astype(np.int8), dist.argmin(-1)

        def build(node: int, sub: np.ndarray, level: int):
            if level == levels:
                return
            base = node * k
            if sub.shape[0] == 0:
                return
            centers, assign = kmedians(sub)
            for j in range(centers.shape[0]):
                level_centers[level][base + j] = centers[j]
                level_valid[level][base + j] = True
                build(base + j, sub[assign == j], level + 1)
            # interior nodes whose subtree ended early (fewer members than
            # branches) stay invalid below; descent never enters them

        build(0, d, 0)
        # a valid interior node must have at least one valid child all the
        # way to the leaves, else greedy descent would dead-end: propagate
        # the node's own center down as a single valid child chain
        for l in range(levels - 1):
            for node in np.nonzero(level_valid[l])[0]:
                lo, hi = node * k, node * k + k
                if not level_valid[l + 1][lo:hi].any():
                    level_centers[l + 1][lo] = level_centers[l][node]
                    level_valid[l + 1][lo] = True
        vocab = cls(level_centers, level_valid, k)
        words = vocab.assign(descs_i8.astype(np.int8),
                             np.ones(len(descs_i8), bool))
        counts = np.bincount(words, minlength=vocab.num_words).astype(np.float64)
        vocab.idf = np.log(len(descs_i8) / np.maximum(counts, 1.0)).astype(
            np.float32)
        return vocab


def load_vocabulary(path: str):
    """Load a vocabulary: .npz (flat or tree, native), an ORB-SLAM-style
    text vocabulary (``ORBvoc.txt``; load_orbslam_text), or a DBoW2 binary
    vocabulary (``orb_vocab.dbow2`` / ``ORBvoc.bin``; load_dbow2_binary)."""
    if path.endswith(".txt"):
        return load_orbslam_text(path)
    if path.endswith(".dbow2") or path.endswith(".bin"):
        return load_dbow2_binary(path)
    return Vocabulary.load(path)


# ---------------------------------------------------------------------------
# ORB-SLAM / DBoW2 text vocabulary format.
#
# The ecosystem's standard pretrained ORB vocabulary (ORB-SLAM2's
# ``ORBvoc.txt``; the reference ships the same tree as a binary
# ``orb_vocab.dbow2``, whose fork-specific binary layout has no oracle
# available offline).  Text layout, reconstructed from DBoW2's
# TemplatedVocabulary::loadFromTextFile/saveToTextFile:
#
#   line 1:  k L scoring_type weighting_type
#   then one line per non-root node, parents before children:
#            <parent_node_id> <is_leaf 0|1> <32 descriptor bytes as ints>
#            <weight>
#
# Node ids are implicit: root is 0, each following line is the next id.
# Leaves may occur above the deepest level in imbalanced branches; they are
# propagated straight down (single valid child chain, same convention the
# trainer uses) so greedy descent reaches a bottom-level word.  Word ids
# are our level-major slot ids, NOT DBoW2's word ids — the vocabulary is
# loaded for its quantization semantics, which don't depend on id labels.
# ---------------------------------------------------------------------------

def _desc_bytes_to_bits(vals) -> np.ndarray:
    b = np.asarray(vals, np.uint8)
    return np.unpackbits(b, bitorder="little").astype(np.int8)


def _bits_to_desc_bytes(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), bitorder="little")


def load_orbslam_text(path: str) -> "TreeVocabulary":
    with open(path) as f:
        header = f.readline().split()
        k, levels = int(header[0]), int(header[1])
        level_centers = [np.zeros((k ** (l + 1), 256), np.int8)
                         for l in range(levels)]
        level_valid = [np.zeros(k ** (l + 1), bool) for l in range(levels)]
        # node bookkeeping: id -> (level, slot); root = (-1, 0)
        node_level = {0: -1}
        node_slot = {0: 0}
        n_children: Dict[int, int] = {0: 0}
        leaf_weights: List[tuple] = []       # (level, slot, weight)
        next_id = 1
        for line in f:
            parts = line.split()
            if not parts:
                continue
            pid = int(parts[0])
            is_leaf = int(parts[1])
            bits = _desc_bytes_to_bits([int(v) for v in parts[2:34]])
            weight = float(parts[34])
            lvl = node_level[pid] + 1
            rank = n_children[pid]
            assert rank < k, f"node {pid} has more than k={k} children"
            slot = node_slot[pid] * k + rank
            n_children[pid] = rank + 1
            level_centers[lvl][slot] = bits
            level_valid[lvl][slot] = True
            node_level[next_id] = lvl
            node_slot[next_id] = slot
            n_children[next_id] = 0
            if is_leaf:
                leaf_weights.append((lvl, slot, weight))
            next_id += 1
    # propagate early leaves (and their weights) down to the bottom level
    idf = np.ones(k ** levels, np.float32)
    for lvl, slot, weight in leaf_weights:
        s_ = slot
        for l in range(lvl + 1, levels):
            child = s_ * k
            level_centers[l][child] = level_centers[l - 1][s_]
            level_valid[l][child] = True
            s_ = child
        idf[s_] = weight
    vocab = TreeVocabulary(level_centers, level_valid, k, idf)
    return vocab


def save_orbslam_text(vocab: "TreeVocabulary", path: str,
                      scoring: int = 0, weighting: int = 0):
    """Write a TreeVocabulary in the text format above (roundtrip tested;
    also lets our trained vocabularies feed DBoW2-based stacks)."""
    k, levels = vocab.k, vocab.levels
    with open(path, "w") as f:
        f.write(f"{k} {levels} {scoring} {weighting}\n")
        # BFS, assigning ids as we go; remember each slot's assigned id
        ids = {(-1, 0): 0}
        for lvl in range(levels):
            for slot in np.nonzero(vocab.level_valid[lvl])[0]:
                slot = int(slot)
                parent = (lvl - 1, slot // k) if lvl else (-1, 0)
                pid = ids[parent]
                is_leaf = 1 if lvl == levels - 1 else                     0 if vocab.level_valid[lvl + 1][slot * k:slot * k + k].any() else 1
                byts = _bits_to_desc_bytes(vocab.level_centers[lvl][slot])
                w = float(vocab.idf[slot]) if lvl == levels - 1 else 0.0
                f.write(f"{pid} {is_leaf} "
                        + " ".join(str(int(v)) for v in byts)
                        + f" {w}\n")
                ids[(lvl, slot)] = len(ids)


# ---------------------------------------------------------------------------
# DBoW2 binary vocabulary format (the reference ships ``orb_vocab.dbow2``).
#
# Layout, matching the de-facto ORB-SLAM2 ``saveToBinaryFile`` /
# ``loadFromBinaryFile`` patch that the .bin/.dbow2 files circulating in the
# ORB-SLAM ecosystem use: a little-endian stream of
#
#   uint32 nb_nodes   (total node count INCLUDING the root)
#   uint32 size_node  (bytes per record; 41 for 256-bit ORB)
#   int32  k, int32 L, int32 scoring_type, int32 weighting_type
#   then one fixed-size record per non-root node, parents before children:
#     int32   parent_node_id
#      32 x uint8 descriptor bytes  (ORB, 256 bits)
#     float32 weight
#     uint8   is_leaf
#
# Node ids are implicit (1..nb_nodes-1), exactly as in the text format.
# No oracle .dbow2 file is reachable offline; the layout is transcribed from
# the public patch's field order and covered by a write->read roundtrip and
# by equivalence with the text format on the same tree
# (tests/test_vocab_generalization.py).
# ---------------------------------------------------------------------------

_DBOW2_NODE = np.dtype([
    ("parent", "<i4"), ("desc", "u1", 32), ("weight", "<f4"),
    ("is_leaf", "u1"),
])


def load_dbow2_binary(path: str) -> "TreeVocabulary":
    with open(path, "rb") as f:
        nb_nodes, size_node = np.frombuffer(f.read(8), "<u4")
        head = np.frombuffer(f.read(16), "<i4")
        k, levels = int(head[0]), int(head[1])
        if size_node != _DBOW2_NODE.itemsize:
            raise ValueError(
                f"{path}: size_node={size_node} != {_DBOW2_NODE.itemsize} — "
                "not a 256-bit ORB DBoW2 binary vocabulary")
        payload = f.read()
        expect = (int(nb_nodes) - 1) * int(size_node)
        if len(payload) != expect:
            raise ValueError(
                f"{path}: payload is {len(payload)} bytes, expected "
                f"{expect} ((nb_nodes-1) * size_node)")
        nodes = np.frombuffer(payload, _DBOW2_NODE)
    level_centers = [np.zeros((k ** (l + 1), 256), np.int8)
                     for l in range(levels)]
    level_valid = [np.zeros(k ** (l + 1), bool) for l in range(levels)]
    node_level = {0: -1}
    node_slot = {0: 0}
    n_children: Dict[int, int] = {0: 0}
    leaf_weights: List[tuple] = []
    for i, nd in enumerate(nodes, start=1):
        pid = int(nd["parent"])
        lvl = node_level[pid] + 1
        rank = n_children[pid]
        assert rank < k, f"node {pid} has more than k={k} children"
        slot = node_slot[pid] * k + rank
        n_children[pid] = rank + 1
        level_centers[lvl][slot] = _desc_bytes_to_bits(nd["desc"])
        level_valid[lvl][slot] = True
        node_level[i] = lvl
        node_slot[i] = slot
        n_children[i] = 0
        if nd["is_leaf"]:
            leaf_weights.append((lvl, slot, float(nd["weight"])))
    idf = np.ones(k ** levels, np.float32)
    for lvl, slot, weight in leaf_weights:
        s_ = slot
        for l in range(lvl + 1, levels):
            child = s_ * k
            level_centers[l][child] = level_centers[l - 1][s_]
            level_valid[l][child] = True
            s_ = child
        idf[s_] = weight
    return TreeVocabulary(level_centers, level_valid, k, idf)


def save_dbow2_binary(vocab: "TreeVocabulary", path: str,
                      scoring: int = 0, weighting: int = 0):
    k, levels = vocab.k, vocab.levels
    records = []
    ids = {(-1, 0): 0}
    for lvl in range(levels):
        for slot in np.nonzero(vocab.level_valid[lvl])[0]:
            slot = int(slot)
            parent = (lvl - 1, slot // k) if lvl else (-1, 0)
            rec = np.zeros((), _DBOW2_NODE)
            rec["parent"] = ids[parent]
            is_leaf = (lvl == levels - 1 or not
                       vocab.level_valid[lvl + 1][slot * k:slot * k + k].any())
            rec["is_leaf"] = 1 if is_leaf else 0
            rec["desc"] = _bits_to_desc_bytes(
                vocab.level_centers[lvl][slot])
            rec["weight"] = (float(vocab.idf[slot])
                             if lvl == levels - 1 else 0.0)
            records.append(rec)
            ids[(lvl, slot)] = len(ids)
    with open(path, "wb") as f:
        f.write(np.asarray([len(records) + 1, _DBOW2_NODE.itemsize],
                           "<u4").tobytes())
        f.write(np.asarray([k, levels, scoring, weighting], "<i4").tobytes())
        f.write(np.stack(records).tobytes())


_DEFAULT_VOCAB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..",
    "assets", "default_vocab.npz",
)


def default_vocabulary(num_words: int = 1024, cache_path: Optional[str] = None,
                       pattern: str = "learned") -> Vocabulary:
    """Deterministic built-in vocabulary trained on synthetic-scene ORB
    descriptors (cached to assets/).  A separate vocabulary is trained and
    cached per descriptor pattern — words learned on one pattern's
    descriptor distribution quantize another's poorly."""
    path = cache_path or os.path.abspath(_DEFAULT_VOCAB_PATH)
    if pattern != "learned" and cache_path is None:
        base, ext = os.path.splitext(path)
        path = f"{base}_{pattern}{ext}"
    if os.path.exists(path):
        v = Vocabulary.load(path)
        if v.num_words == num_words:
            return v
    import jax.numpy as jnp
    from ..camera import Perspective
    from ..models.frontend import OrbFrontend
    from ..utils import synthetic

    cam = Perspective.create(fx=350.0, fy=350.0, cx=208.0, cy=160.0,
                             cols=416, rows=320)
    fe = OrbFrontend(rows=320, cols=416, max_keypts=600, num_levels=4,
                     pattern=pattern)
    descs = []
    rng = np.random.default_rng(123)
    for s in range(6):
        scene = synthetic.PatchSceneRenderer(rng, n_points=500, rows=320, cols=416)
        poses = synthetic.orbit_trajectory(4, radius=2.0, target=(0, 0, 6))
        for i in range(4):
            img = scene.render(cam, poses[i])
            kp = fe.extract(jnp.asarray(img))
            v = np.asarray(kp.valid)
            descs.append(np.asarray(kp.desc_i8)[v])
    descs = np.concatenate(descs, 0)
    vocab = Vocabulary.train(descs, num_words=num_words, iters=6)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    vocab.save(path)
    return vocab


class _InvertedIndex:
    """Append-only word->keyframe postings with a lazily rebuilt CSR view.

    The old representation (a Python set per word) rebuilt the CSR with
    per-posting Python loops on EVERY query — O(total postings) interpreted
    work per keyframe insertion, which dominates at 10^3 keyframes x 32k
    words.  Here postings append in O(words/KF) numpy, removal is a mask,
    and the CSR (what the native accumulation kernel consumes) is rebuilt
    by one argsort only when dirty."""

    def __init__(self, num_words: int, cap: int = 1 << 14):
        self.num_words = num_words
        self._w = np.zeros(cap, np.int64)
        self._kf = np.zeros(cap, np.int64)
        self._alive = np.zeros(cap, bool)
        self._n = 0
        self._kf_rows: Dict[int, tuple] = {}
        self._csr = None

    def add(self, kf: int, words: np.ndarray):
        m = len(words)
        while self._n + m > len(self._w):
            grow = len(self._w)
            self._w = np.concatenate([self._w, np.zeros(grow, np.int64)])
            self._kf = np.concatenate([self._kf, np.zeros(grow, np.int64)])
            self._alive = np.concatenate([self._alive,
                                          np.zeros(grow, bool)])
        sl = slice(self._n, self._n + m)
        self._w[sl] = words
        self._kf[sl] = kf
        self._alive[sl] = True
        self._kf_rows[kf] = (self._n, self._n + m)
        self._n += m
        self._csr = None

    def remove(self, kf: int):
        rows = self._kf_rows.pop(kf, None)
        if rows is not None:
            self._alive[rows[0]:rows[1]] = False
            self._csr = None

    def clear(self):
        self._alive[: self._n] = False
        self._n = 0
        self._kf_rows.clear()
        self._csr = None

    def word_keyframes(self, w: int) -> np.ndarray:
        offsets, inv = self.csr()
        return inv[offsets[w]:offsets[w + 1]]

    def csr(self):
        """-> (offsets (W+1,) int64, kfs (P,) int64) sorted by word."""
        if self._csr is None:
            rows = np.where(self._alive[: self._n])[0]
            w = self._w[rows]
            order = np.argsort(w, kind="stable")
            counts = np.bincount(w, minlength=self.num_words)
            offsets = np.zeros(self.num_words + 1, np.int64)
            np.cumsum(counts, out=offsets[1:])
            self._csr = (offsets, self._kf[rows][order])
        return self._csr


class BowDatabase:
    """Inverted index word -> keyframes + per-KF BoW vectors (host).

    Implements the reference's two queries (``data/bow_database``):
    relocalization candidates (shared-word gate + score) and loop candidates
    (shared-word gate + min-score + covisibility-group accumulation).
    """

    def __init__(self, vocab: Vocabulary, map_db=None):
        self.vocab = vocab
        self.map_db = map_db
        self.inverted = _InvertedIndex(vocab.num_words)
        self.kf_words: Dict[int, np.ndarray] = {}     # kf -> (K,) word ids
        self.kf_bow: Dict[int, np.ndarray] = {}       # kf -> (W,) tf-idf vec

    # ------------------------------------------------------------------
    def compute_words(self, desc_i8: np.ndarray, valid: np.ndarray) -> np.ndarray:
        return self.vocab.assign(desc_i8, valid)

    def compute_words_batch(self, desc_b: np.ndarray,
                            valid_b: np.ndarray) -> np.ndarray:
        """Batch word assignment for B keyframes in one device call, padded
        to a power-of-2 batch bucket so shape compiles are bounded."""
        B = desc_b.shape[0]
        cap = 1 << int(np.ceil(np.log2(max(B, 1))))
        if cap != B:
            desc_b = np.concatenate(
                [desc_b, np.zeros((cap - B,) + desc_b.shape[1:],
                                  desc_b.dtype)])
            valid_b = np.concatenate(
                [valid_b, np.zeros((cap - B,) + valid_b.shape[1:], bool)])
        return self.vocab.assign_batch(desc_b, valid_b)[:B]

    def bow_vecs_batch(self, words_b: np.ndarray) -> np.ndarray:
        """tf-idf vectors for B keyframes in ONE device call (per-KF
        bow_vector was a link round trip each); batch padded to a
        power-of-2 bucket.  Pure compute — safe to call with no lock."""
        import jax.numpy as jnp
        B = words_b.shape[0]
        if B == 0:
            return np.zeros((0, self.vocab.num_words), np.float32)
        cap = 1 << int(np.ceil(np.log2(max(B, 1))))
        wb = words_b
        if cap != B:
            wb = np.concatenate(
                [wb, np.full((cap - B,) + wb.shape[1:], -1, wb.dtype)])
        return np.asarray(bow_ops.bow_vector_batch(
            jnp.asarray(wb), jnp.asarray(self.vocab.idf),
            self.vocab.num_words))[:B]

    def add_keyframes_batch(self, kfs: list, words_b: np.ndarray,
                            vecs_b: np.ndarray):
        """Dictionary/posting inserts only (host, O(words)) — callers
        precompute vecs_b via bow_vecs_batch outside the map lock."""
        for kf, w, v in zip(kfs, words_b, vecs_b):
            self.kf_words[kf] = w
            self.kf_bow[kf] = v
            self.inverted.add(kf, np.unique(w[w >= 0]))

    def gate_words(self, words: np.ndarray) -> np.ndarray:
        """Ids to use in match gates (word_gate): leaf words for a flat
        vocabulary, coarser direct-index nodes for a tree vocabulary."""
        return self.vocab.gate_ids(words)

    def bow_vec(self, words: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        return np.asarray(bow_ops.bow_vector(
            jnp.asarray(words), jnp.asarray(self.vocab.idf), self.vocab.num_words
        ))

    def add_keyframe(self, kf: int, words: np.ndarray):
        self.kf_words[kf] = words
        self.kf_bow[kf] = self.bow_vec(words)
        self.inverted.add(kf, np.unique(words[words >= 0]))

    def remove_keyframe(self, kf: int):
        words = self.kf_words.pop(kf, None)
        self.kf_bow.pop(kf, None)
        if words is not None:
            self.inverted.remove(kf)

    def score(self, a: int, b: int) -> float:
        return float(1.0 - 0.5 * np.abs(self.kf_bow[a] - self.kf_bow[b]).sum())

    def score_vec(self, v: np.ndarray, kf: int) -> float:
        return float(1.0 - 0.5 * np.abs(v - self.kf_bow[kf]).sum())

    # ------------------------------------------------------------------
    def _shared_word_counts(self, words: np.ndarray, exclude: Set[int]):
        from ..utils import native
        offsets, inv = self.inverted.csr()
        ks, vs = native.bow_shared_words(words, offsets, inv)
        return {int(k): int(v) for k, v in zip(ks, vs) if int(k) not in exclude}

    def acquire_relocalization_candidates(self, words: np.ndarray,
                                          max_candidates: int = 10) -> List[int]:
        counts = self._shared_word_counts(words, exclude=set())
        if not counts:
            return []
        max_shared = max(counts.values())
        thr = 0.8 * max_shared
        v = self.bow_vec(words)
        scored = [
            (self.score_vec(v, kf), kf) for kf, c in counts.items() if c >= thr
        ]
        scored.sort(reverse=True)
        return [kf for _, kf in scored[:max_candidates]]

    def acquire_loop_candidates(self, kf: int, min_score: float,
                                connected: Set[int],
                                max_candidates: int = 10) -> List[int]:
        """Shared-word gate + min-score + covisibility-group accumulated score
        (the reference accumulates scores over each candidate's covisibles)."""
        words = self.kf_words.get(kf)
        if words is None:
            return []
        counts = self._shared_word_counts(words, exclude=connected | {kf})
        if not counts:
            return []
        max_shared = max(counts.values())
        thr = 0.8 * max_shared
        first = [
            (self.score(kf, cand), cand)
            for cand, c in counts.items() if c >= thr
        ]
        first = [(s, c) for s, c in first if s >= min_score]
        if not first:
            return []
        # accumulate over covisibility groups
        best_of_group = {}
        for s, cand in first:
            group = [cand]
            if self.map_db is not None:
                group += self.map_db.get_top_covisible(cand, 10)
            acc = 0.0
            best_kf, best_s = cand, s
            for g in group:
                if g in self.kf_bow and g in counts:
                    gs = self.score(kf, g)
                    acc += gs
                    if gs > best_s:
                        best_kf, best_s = g, gs
            best_of_group[best_kf] = max(best_of_group.get(best_kf, 0.0), acc)
        if not best_of_group:
            return []
        best_acc = max(best_of_group.values())
        out = [
            c for c, acc in best_of_group.items() if acc >= 0.75 * best_acc
        ]
        out.sort(key=lambda c: -best_of_group[c])
        return out[:max_candidates]
