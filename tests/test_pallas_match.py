"""Pallas fused projection matcher vs the XLA composition — exact equality.

The kernel must reproduce ops.match.match_descriptors over
projection_gate & scale_gate bit-for-bit (same tie-breaking as
top_k/argmin), for every acceptance-flag combination and for shapes that
need padding.  Runs in interpreter mode on CPU; the compiled-kernel
equivalence on the real backend is checked by docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from openvslam_tpu.ops import match as M
from openvslam_tpu.ops.pallas.match_kernel import projection_match_pallas


def _xla_reference(a_desc, b_desc, uv, vis, radius, pred, b_xy, b_lvl,
                   b_val, max_dist, ratio, cross_check):
    gate = M.projection_gate(jnp.asarray(uv), jnp.asarray(vis),
                             jnp.asarray(b_xy), jnp.asarray(radius))
    sgate = jnp.abs(jnp.asarray(b_lvl)[None, :]
                    - jnp.asarray(pred)[:, None]) <= 1
    gate = gate & (sgate | (jnp.asarray(pred) < 0)[:, None])
    return M.match_descriptors(
        jnp.asarray(a_desc), jnp.asarray(b_desc), jnp.asarray(vis),
        jnp.asarray(b_val), gate=gate, max_dist=max_dist, ratio=ratio,
        cross_check=cross_check,
    )


def _random_problem(rng, L, K, cols=640, rows=480):
    a_desc = rng.integers(0, 2, (L, 256)).astype(np.int8)
    b_desc = rng.integers(0, 2, (K, 256)).astype(np.int8)
    # plant near-duplicates so real matches (and ties) exist
    for i in range(0, min(L, K), 3):
        b_desc[i % K] = a_desc[i]
    uv = rng.uniform(0, [cols, rows], (L, 2)).astype(np.float32)
    b_xy = rng.uniform(0, [cols, rows], (K, 2)).astype(np.float32)
    # many keypoints near projections so the radius gate passes often
    b_xy[: K // 2] = uv[: K // 2] + rng.normal(0, 5, (K // 2, 2))
    vis = rng.random(L) > 0.1
    b_val = rng.random(K) > 0.1
    radius = rng.uniform(4, 30, L).astype(np.float32)
    pred = rng.integers(-1, 8, L).astype(np.int32)
    b_lvl = rng.integers(0, 8, K).astype(np.int32)
    return a_desc, b_desc, uv, vis, radius, pred, b_xy, b_lvl, b_val


@pytest.mark.parametrize("L,K", [(512, 1024), (300, 257), (1024, 512)])
@pytest.mark.parametrize("ratio,cross", [(None, True), (0.9, True),
                                         (0.9, False), (None, False)])
def test_pallas_match_equals_xla(rng, L, K, ratio, cross):
    prob = _random_problem(rng, L, K)
    for max_dist in (M.HAMMING_DIST_THR_HIGH, M.HAMMING_DIST_THR_LOW):
        idx_ref, dist_ref = _xla_reference(*prob, max_dist, ratio, cross)
        idx_k, dist_k = projection_match_pallas(
            *[jnp.asarray(x) for x in prob],
            max_dist=max_dist, ratio=ratio, cross_check=cross,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_ref))
        matched = np.asarray(idx_ref) >= 0
        np.testing.assert_array_equal(np.asarray(dist_k)[matched],
                                      np.asarray(dist_ref)[matched])


def test_pallas_match_all_gated_out(rng):
    prob = list(_random_problem(rng, 256, 256))
    prob[3] = np.zeros(256, bool)          # nothing visible
    idx_k, _ = projection_match_pallas(
        *[jnp.asarray(x) for x in prob], interpret=True)
    assert (np.asarray(idx_k) == -1).all()
