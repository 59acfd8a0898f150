"""Pallas FAST kernel vs the XLA reference implementation (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from openvslam_tpu.ops import fast
from openvslam_tpu.ops.pallas.fast_kernel import fast_score_maps_pallas, TILE_H


def test_pallas_fast_matches_xla(rng):
    h, w = 2 * TILE_H, 256
    img = jnp.asarray(rng.integers(0, 255, (h, w)).astype(np.float32))
    hi_ref, lo_ref = fast.fast_score_maps(img, [20.0, 7.0])
    hi, lo = fast_score_maps_pallas(img, 20.0, 7.0, interpret=True)
    # interior must match exactly (borders zeroed slightly differently:
    # the XLA version zeroes a 3px frame; compare inside a 4px frame)
    b = 4
    np.testing.assert_allclose(
        np.asarray(hi)[b:-b, b:-b], np.asarray(hi_ref)[b:-b, b:-b], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lo)[b:-b, b:-b], np.asarray(lo_ref)[b:-b, b:-b], atol=1e-4
    )
    assert np.asarray(hi).max() > 0


def test_topk_small_equals_lax_topk(rng):
    """topk_small must reproduce jax.lax.top_k exactly, ties included."""
    import jax

    for shape, k in [((300, 1024), 3), ((40, 64), 9), ((7, 33), 1)]:
        x = rng.integers(0, 50, shape).astype(np.float32)  # many ties
        v1, i1 = jax.lax.top_k(jnp.asarray(x), k)
        v2, i2 = fast.topk_small(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
