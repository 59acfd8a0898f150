"""FBoW-style bag-of-words operations, TPU-native.

The reference wraps a DBoW2-fork vocabulary (~1M-leaf tree, greedy descent
per descriptor; SURVEY.md §2.1 BoW vocabulary row, §0 deviation note).  The
TPU-native formulation is FLAT: W binary word centers, and word assignment is
one MXU Hamming matmul + argmin — exact nearest-word quantization (better
than greedy tree descent) and two orders of magnitude fewer instructions
than pointer-chasing a tree.

The reference's "direct index at tree level l" used by match::bow_tree
becomes a word-equality gate on the full Hamming matrix — the same
candidate-restriction semantics, as one fused mask.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def assign_words(desc_i8: jnp.ndarray, centers_i8: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """(K,256) descriptors x (W,256) centers -> (K,) word ids (-1 invalid)."""
    dots = jax.lax.dot_general(
        desc_i8, centers_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    na = jnp.sum(desc_i8.astype(jnp.int32), -1)
    nb = jnp.sum(centers_i8.astype(jnp.int32), -1)
    d = na[:, None] + nb[None, :] - 2 * dots
    w = jnp.argmin(d, -1).astype(jnp.int32)
    return jnp.where(valid, w, -1)


@functools.partial(jax.jit, static_argnames=("num_words",))
def bow_vector(word_ids: jnp.ndarray, idf: jnp.ndarray, num_words: int):
    """tf-idf BoW vector (W,), L1-normalized (DBoW2 scoring convention)."""
    ok = word_ids >= 0
    hist = jnp.zeros(num_words, jnp.float32).at[jnp.clip(word_ids, 0)].add(
        ok.astype(jnp.float32)
    )
    v = hist * idf
    s = jnp.sum(jnp.abs(v))
    return v / jnp.maximum(s, 1e-12)


@jax.jit
def l1_score(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity: 1 - 0.5*|v1 - v2|_1 for L1-normalized vectors."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2))


@jax.jit
def l1_scores_batch(v: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(W,) query vs (N,W) database -> (N,) scores."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(db - v[None, :]), -1)


def word_gate(words_a: jnp.ndarray, words_b: jnp.ndarray) -> jnp.ndarray:
    """(N,),(M,) -> (N,M) bool gate: same (valid) word (ref match::bow_tree)."""
    return (words_a[:, None] == words_b[None, :]) & (words_a >= 0)[:, None]


assign_words_batch = jax.jit(jax.vmap(assign_words, in_axes=(0, None, 0)))
"""(B,K,256) descriptors -> (B,K) word ids in ONE device call (loop-worker
batch registration: per-keyframe assignment paid one link round trip each —
~0.5 s/KF through the tunnel, 255 s on the 4,000-frame city run)."""


@functools.partial(jax.jit, static_argnames=("num_words",))
def bow_vector_batch(word_ids_b: jnp.ndarray, idf: jnp.ndarray,
                     num_words: int) -> jnp.ndarray:
    """(B,K) word ids -> (B,W) tf-idf vectors in one call."""
    return jax.vmap(lambda w: bow_vector(w, idf, num_words))(word_ids_b)


# ---------------------------------------------------------------------------
# Hierarchical (DBoW2-style) vocabulary tree.
#
# The reference's vocabulary is a k-branch, L-level tree descended greedily
# per descriptor (``data/bow_vocabulary``; SURVEY.md §2.1).  The TPU-native
# descent is L static stages; each stage gathers the current node's k child
# centers and takes a Hamming argmin — shapes are static (K, k, 256), no
# pointer chasing, no data-dependent control flow.  Greedy descent is NOT
# exact nearest-leaf quantization; this op reproduces the reference's
# (greedy) semantics, while the flat ``assign_words`` above is the
# exact-quantization default.

_INVALID_CHILD_PENALTY = 1 << 20


@functools.partial(jax.jit, static_argnames=("k",))
def tree_assign_words(desc_i8: jnp.ndarray, valid: jnp.ndarray,
                      level_centers: tuple, level_valid: tuple,
                      k: int) -> jnp.ndarray:
    """Greedy tree descent: (K,256) descriptors -> (K,) leaf word ids.

    level_centers[l] is (k**(l+1), 256) int8 in {0,1}, indexed by the base-k
    path prefix; level_valid[l] masks children that exist in the trained
    tree.  Returns -1 for invalid descriptors.
    """
    K = desc_i8.shape[0]
    d32 = desc_i8.astype(jnp.int32)
    na = jnp.sum(d32, -1)                                     # (K,)
    node = jnp.zeros((K,), jnp.int32)
    for C, V in zip(level_centers, level_valid):
        child = node[:, None] * k + jnp.arange(k, dtype=jnp.int32)[None, :]
        cc = C[child].astype(jnp.int32)                       # (K,k,256)
        cv = V[child]                                         # (K,k)
        dots = jnp.einsum("kd,kjd->kj", d32, cc)
        nb = jnp.sum(cc, -1)                                  # (K,k)
        dist = na[:, None] + nb - 2 * dots
        dist = jnp.where(cv, dist, _INVALID_CHILD_PENALTY)
        j = jnp.argmin(dist, -1).astype(jnp.int32)
        node = node * k + j
    return jnp.where(valid, node, -1)


@functools.partial(jax.jit, static_argnames=("k",))
def tree_assign_words_batch(desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                            level_centers: tuple, level_valid: tuple,
                            k: int) -> jnp.ndarray:
    """(B,K,256) descriptors -> (B,K) leaf word ids in one device call."""
    return jax.vmap(
        lambda d, v: tree_assign_words(d, v, level_centers, level_valid, k)
    )(desc_b, valid_b)


def node_at_level(words: jnp.ndarray, k: int, levels: int,
                  level: int) -> jnp.ndarray:
    """Ancestor node id of each leaf word at tree ``level`` (1..levels).

    The reference's "direct index at level l" (used by match::bow_tree to
    widen the candidate gate) is exactly this quotient: leaf ids are base-k
    path encodings, so the level-l ancestor is word // k**(levels-level).
    Invalid words (-1) stay -1.  Works on numpy or jax arrays.
    """
    q = k ** (levels - level)
    anc = words // q
    return jnp.where(words >= 0, anc, -1) if isinstance(words, jnp.ndarray) \
        else ((words >= 0) * anc + (words < 0) * -1)
