"""Batched RANSAC — the TPU replacement for the reference's sequential
``find_via_ransac()`` loops (``solve/*``; SURVEY.md §2.1 Solvers row).

Instead of iterating hypotheses with early exit, we draw a fixed number of
minimal samples, fit and score ALL of them with ``vmap``, and take the
argmax-inlier model.  With a few hundred hypotheses this matches or exceeds
the sequential RANSAC's robustness while mapping perfectly onto the VPU/MXU.

Sampling without replacement per hypothesis uses the Gumbel top-k trick so
the whole thing is one fused program with static shapes.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def sample_minimal_sets(key, mask: jnp.ndarray, n_hyp: int, k: int) -> jnp.ndarray:
    """Draw (n_hyp, k) index sets from the valid entries of ``mask`` (N,).

    Gumbel-top-k: per hypothesis, perturb log-mask with Gumbel noise and take
    the k largest — a without-replacement sample restricted to valid entries.
    """
    n = mask.shape[0]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (n_hyp, n), dtype=jnp.float32)
    _, idx = jax.lax.top_k(logits[None, :] + g, k)
    return idx


def run_ransac(
    key,
    fit_fn: Callable[[jnp.ndarray], jnp.ndarray],
    score_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    mask: jnp.ndarray,
    n_hyp: int,
    k: int,
):
    """Generic batched RANSAC.

    fit_fn(sample_idx (k,)) -> model pytree (may itself be a batch of
        sub-hypotheses, e.g. 4 E decompositions; score_fn must reduce them).
    score_fn(model) -> (score scalar, inlier_mask (N,) bool).

    Returns (best_model, best_score, best_inliers).
    """
    samples = sample_minimal_sets(key, mask, n_hyp, k)
    models = jax.vmap(fit_fn)(samples)
    scores, inliers = jax.vmap(score_fn)(models)
    best = jnp.argmax(scores)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    return best_model, scores[best], inliers[best]
