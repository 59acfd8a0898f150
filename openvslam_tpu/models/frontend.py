"""ORB front-end: one jitted program per image geometry (ref ``feature/orb_extractor``).

The reference extracts per level with OpenCV parallel_for and merges
std::vectors (SURVEY.md §3.2 HOT-1).  Here the whole extraction is a single
XLA program with static level shapes: the host passes one (H,W) u8 image and
receives a fixed-capacity keypoint structure-of-arrays:

    xy        (K,2) f32   keypoint position at level-0 scale
    response  (K,)  f32
    level     (K,)  i32
    angle     (K,)  f32
    desc_u32  (K,8) u32   packed rBRIEF
    desc_i8   (K,256) i8  unpacked bits (MXU matching operand)
    valid     (K,)  bool

Keypoint budget per level follows the reference's geometric allocation
(num_pts * (1-f)/(1-f^L) * f^l with f = 1/scale).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import fast, orb, pyramid


class Keypoints(NamedTuple):
    xy: jnp.ndarray
    response: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    desc_u32: jnp.ndarray
    desc_i8: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self):
        return self.xy.shape[0]


def level_budgets(max_keypts: int, num_levels: int, scale: float):
    f = 1.0 / scale
    total = (1 - f**num_levels) / (1 - f)
    raw = [max_keypts * (1 - f) / (1 - f**num_levels) * f**l for l in range(num_levels)]
    budget = [max(16, int(round(v))) for v in raw]
    # round each level budget up to a multiple of 8 for friendlier layouts
    budget = [((b + 7) // 8) * 8 for b in budget]
    del total
    return budget


class OrbFrontend:
    """Configured extractor; `extract` is jitted per (rows, cols) geometry."""

    def __init__(self, rows: int, cols: int, max_keypts: int = 2048,
                 num_levels: int = 8, scale_factor: float = 1.2,
                 ini_fast_thr: float = 20.0, min_fast_thr: float = 7.0,
                 cell: int = 32, pattern: str = "learned"):
        self.rows, self.cols = rows, cols
        self.pattern = pattern  # rBRIEF test pattern: "learned" | "cv" (ops.orb)
        self.num_levels = num_levels
        self.scale_factor = scale_factor
        self.ini_fast_thr = ini_fast_thr
        self.min_fast_thr = min_fast_thr
        self.cell = cell
        self.budgets = level_budgets(max_keypts, num_levels, scale_factor)
        self.capacity = sum(self.budgets)
        self.scales = pyramid.scale_factors(num_levels, scale_factor)
        self._extract = jax.jit(self._extract_impl)

    _shared_cache: dict = {}

    @classmethod
    def shared(cls, rows: int, cols: int, max_keypts: int = 2048,
               num_levels: int = 8, scale_factor: float = 1.2,
               ini_fast_thr: float = 20.0, min_fast_thr: float = 7.0,
               cell: int = 32, pattern: str = "learned") -> "OrbFrontend":
        """Process-wide instance cache.  The frontend is stateless (geometry
        + compiled programs), so Systems with identical feature settings can
        share one — without this, every System re-jits the extractor (the
        jit cache is per-instance), which costs a full remote compile per
        session on tunnel-attached TPUs."""
        key = (rows, cols, max_keypts, num_levels, scale_factor,
               ini_fast_thr, min_fast_thr, cell, pattern)
        inst = cls._shared_cache.get(key)
        if inst is None:
            inst = cls(rows, cols, max_keypts, num_levels, scale_factor,
                       ini_fast_thr, min_fast_thr, cell, pattern)
            cls._shared_cache[key] = inst
        return inst

    def extract(self, image_u8: jnp.ndarray, mask: jnp.ndarray | None = None) -> Keypoints:
        if mask is None:
            mask = jnp.ones((), jnp.float32)  # sentinel: no mask
            return self._extract(image_u8, None)
        return self._extract(image_u8, mask)

    @functools.partial(jax.jit, static_argnums=0)
    def _extract_impl(self, image_u8, mask):
        impl = orb.brief_impl_name()
        img = image_u8.astype(jnp.float32)
        levels = pyramid.build_pyramid(img, self.num_levels, self.scale_factor)
        lvl_masks = None
        if mask is not None:
            lvl_masks = [
                jax.image.resize(mask, lvl_img.shape, method="nearest")
                for lvl_img in levels
            ]
        # all-levels detection: grouped FAST launches + one cross-level
        # batched top-k (bit-exact vs the per-level loop; ops.fast.detect_levels)
        dets = fast.detect_levels(
            levels, self.ini_fast_thr, self.min_fast_thr, self.budgets,
            cell=self.cell, masks=lvl_masks,
        )
        xs, rs, ls, ans, descs, vs = [], [], [], [], [], []
        patches, fxs, fys = [], [], []
        for l, (lvl_img, budget) in enumerate(zip(levels, self.budgets)):
            xy, resp, valid = dets[l]
            blurred = pyramid.gaussian_blur(lvl_img)
            if impl == "mxu2":
                # batched-levels path: only the zero-gather (budget, 31, 31)
                # patch extraction happens per level; orientation +
                # description run ONCE over the concatenated patches below
                # (ops.orb.describe_patches)
                p, fx, fy = orb.extract_patches_onehot(
                    blurred, xy, orb.pattern_radius(self.pattern))
                patches.append(p)
                fxs.append(fx)
                fys.append(fy)
            elif impl in ("mxu", "binned"):
                # fused zero-gather path: orientation + descriptors from one
                # patch extraction (see ops.orb.describe_mxu[_binned])
                fn = orb.describe_mxu if impl == "mxu" else orb.describe_mxu_binned
                d_u32, ang = fn(blurred, xy, self.pattern)
                ans.append(ang)
                descs.append(d_u32)
            else:
                ang = orb.ic_angles(lvl_img, xy)
                d_u32 = orb.brief_descriptors(blurred, xy, ang, self.pattern)
                ans.append(ang)
                descs.append(d_u32)
            xs.append(xy * self.scales[l])
            rs.append(resp)
            ls.append(jnp.full(budget, l, jnp.int32))
            vs.append(valid)
        xy = jnp.concatenate(xs, 0)
        resp = jnp.concatenate(rs, 0)
        lvl = jnp.concatenate(ls, 0)
        valid = jnp.concatenate(vs, 0)
        if impl == "mxu2":
            d32, ang = orb.describe_patches(
                jnp.concatenate(patches, 0),
                jnp.concatenate(fxs, 0),
                jnp.concatenate(fys, 0),
                self.pattern,
            )
        else:
            ang = jnp.concatenate(ans, 0)
            d32 = jnp.concatenate(descs, 0)
        d8 = orb.unpack_bits_i8(d32)
        # zero out invalid descriptors so matmuls can't produce spurious hits
        d8 = jnp.where(valid[:, None], d8, 0)
        return Keypoints(xy, resp, lvl, ang, d32, d8, valid)

    # ------------------------------------------------------------------
    # multi-stream extraction (the aggregate-throughput regime: K sessions
    # or offline mapping on one chip).  FAST runs as ONE row-stacked Pallas
    # launch per level for the whole batch (ops.fast.detect_level_batch);
    # selection/blur/describe are the same single-frame formulations under
    # vmap, so per-frame results match extract() (descriptors bit-wise on
    # the XLA paths; the batched one-hot contractions also fill the MXU far
    # better than 1k-keypoint single frames — see docs/kernels.md).
    # ------------------------------------------------------------------
    def extract_batch(self, images_u8: jnp.ndarray,
                      masks: jnp.ndarray | None = None) -> Keypoints:
        """(B,H,W) u8 -> Keypoints with a leading batch axis."""
        return self._extract_batch_impl(images_u8, masks)

    @functools.partial(jax.jit, static_argnums=0)
    def _extract_batch_impl(self, images_u8, masks):
        impl = orb.brief_impl_name()
        imgs = images_u8.astype(jnp.float32)          # (B,H,W)
        b = imgs.shape[0]
        shapes = pyramid.level_shapes(self.rows, self.cols,
                                      self.num_levels, self.scale_factor)
        levels = [imgs]
        for l in range(1, self.num_levels):
            hl, wl = shapes[l]
            # integer-valued levels at HIGHEST resize precision — the same
            # platform-determinism contract as pyramid.build_pyramid
            levels.append(pyramid.quantize_u8_grid(jax.image.resize(
                levels[-1], (b, hl, wl), method="linear", antialias=True,
                precision=jax.lax.Precision.HIGHEST)))
        xs, rs, ls, ans, descs, vs = [], [], [], [], [], []
        for l, (lvl_imgs, budget) in enumerate(zip(levels, self.budgets)):
            lvl_masks = None
            if masks is not None:
                lvl_masks = jax.image.resize(
                    masks, lvl_imgs.shape, method="nearest")
            xy, resp, valid = fast.detect_level_batch(
                lvl_imgs, self.ini_fast_thr, self.min_fast_thr, budget,
                cell=self.cell, masks=lvl_masks,
            )
            blurred = jax.vmap(pyramid.gaussian_blur)(lvl_imgs)
            if impl in ("mxu", "mxu2", "binned"):
                fn = (orb.describe_mxu_binned if impl == "binned"
                      else orb.describe_mxu)
                d_u32, ang = jax.vmap(lambda im, p: fn(im, p, self.pattern))(
                    blurred, xy)
            else:
                ang = jax.vmap(orb.ic_angles)(lvl_imgs, xy)
                d_u32 = jax.vmap(
                    lambda im, p, a: orb.brief_descriptors(im, p, a, self.pattern)
                )(blurred, xy, ang)
            xs.append(xy * self.scales[l])
            rs.append(resp)
            ls.append(jnp.broadcast_to(jnp.int32(l), (b, budget)))
            vs.append(valid)
            ans.append(ang)
            descs.append(d_u32)
        xy = jnp.concatenate(xs, 1)
        resp = jnp.concatenate(rs, 1)
        lvl = jnp.concatenate(ls, 1)
        valid = jnp.concatenate(vs, 1)
        ang = jnp.concatenate(ans, 1)
        d32 = jnp.concatenate(descs, 1)
        d8 = jax.vmap(orb.unpack_bits_i8)(d32)
        d8 = jnp.where(valid[:, :, None], d8, 0)
        return Keypoints(xy, resp, lvl, ang, d32, d8, valid)
