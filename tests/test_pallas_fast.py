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


def _pyramid(rng, shapes):
    return [jnp.asarray(rng.integers(0, 255, s).astype(np.float32))
            for s in shapes]


def test_detect_levels_matches_per_level_xla(rng):
    """detect_levels (cross-level batched top-k, XLA score path) must be
    bit-identical per level to the detect_level loop it replaced."""
    shapes = [(96, 160), (80, 133), (67, 111), (56, 93)]
    budgets = [64, 48, 32, 24]
    levels = _pyramid(rng, shapes)
    multi = fast.detect_levels(levels, 20.0, 7.0, budgets, cell=32)
    for l, (im, b) in enumerate(zip(levels, budgets)):
        xy, resp, valid = fast.detect_level(im, 20.0, 7.0, b, cell=32)
        mx, mr, mv = multi[l]
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(mv))
        np.testing.assert_array_equal(
            np.asarray(xy)[np.asarray(valid)], np.asarray(mx)[np.asarray(mv)])
        np.testing.assert_array_equal(
            np.asarray(resp)[np.asarray(valid)], np.asarray(mr)[np.asarray(mv)])


def test_detect_levels_mask_matches_per_level(rng):
    shapes = [(64, 128), (54, 107)]
    budgets = [48, 32]
    levels = _pyramid(rng, shapes)
    masks = [jnp.asarray((rng.random(s) > 0.3).astype(np.float32))
             for s in shapes]
    multi = fast.detect_levels(levels, 20.0, 7.0, budgets, cell=32, masks=masks)
    for l, (im, b, m) in enumerate(zip(levels, budgets, masks)):
        xy, resp, valid = fast.detect_level(im, 20.0, 7.0, b, cell=32, mask=m)
        mx, mr, mv = multi[l]
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(mv))
        np.testing.assert_array_equal(
            np.asarray(xy)[np.asarray(valid)], np.asarray(mx)[np.asarray(mv)])


def test_detect_levels_grouped_pallas_matches(rng, monkeypatch):
    """The grouped-canvas Pallas path (levels row-stacked per padded-width
    class) must reproduce the per-level Pallas launches exactly: interior
    values are band-position-independent and every level's 3-px border is
    re-zeroed after slicing."""
    import functools
    from openvslam_tpu.ops.pallas import fast_kernel

    # run the kernel in interpret mode on CPU for both paths
    monkeypatch.setattr(fast, "_use_pallas", lambda: True)
    monkeypatch.setattr(
        fast_kernel, "fast_score_maps_pallas",
        functools.partial(fast_kernel.fast_score_maps_pallas, interpret=True),
    )
    # widths pad to 256, 256, 128, 128 -> two groups of two levels
    shapes = [(96, 250), (80, 208), (67, 120), (56, 100)]
    budgets = [64, 48, 32, 24]
    levels = _pyramid(rng, shapes)
    multi = fast.detect_levels(levels, 20.0, 7.0, budgets, cell=32)
    for l, (im, b) in enumerate(zip(levels, budgets)):
        s_hi, s_lo = fast_kernel.fast_score_maps_pallas(im, 20.0, 7.0)
        xy, resp, valid = fast.select_from_scores(s_hi, s_lo, b, cell=32)
        mx, mr, mv = multi[l]
        np.testing.assert_array_equal(np.asarray(valid), np.asarray(mv))
        np.testing.assert_array_equal(
            np.asarray(xy)[np.asarray(valid)], np.asarray(mx)[np.asarray(mv)])
        np.testing.assert_array_equal(
            np.asarray(resp)[np.asarray(valid)], np.asarray(mr)[np.asarray(mv)])
