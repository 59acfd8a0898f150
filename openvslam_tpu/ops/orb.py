"""Oriented rBRIEF description: IC-angle orientation + rotated binary tests.

TPU-native redesign of the reference's ``orb_extractor`` describe stage
(SURVEY.md §2.1 ORB extractor row): per-keypoint work is expressed as batched
gathers + elementwise math over a fixed keypoint capacity, not a per-keypoint
loop.

Deviation note: the reference uses the learned ``bit_pattern_31`` test pairs.
We re-run ORB's pattern-learning procedure ourselves on synthetic patches
(tools/make_brief_pattern.py: candidate pairs in the patch disc, keep 256
tests with mean ~ 0.5 and low mutual correlation) and ship the result as
assets/brief_pattern.npy.  The system is self-consistent (we never need to
match against OpenCV descriptors) and the pattern is validated behaviorally:
matching under known warps, Hamming-distance separation statistics, and
end-to-end ATE.  Orientation steering rotates the pattern continuously
instead of the reference's 30-degree lookup discretization.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

PATCH_RADIUS = 15          # IC-angle patch (ref: r=15 -> 31x31)
DESC_BITS = 256

# ---------------------------------------------------------------------------
# fixed test pattern (deterministic; see deviation note above).  Preferred:
# the decorrelated pattern learned offline on synthetic patches by
# tools/make_brief_pattern.py (ORB's selection procedure re-run); fallback:
# Gaussian BRIEF if the asset is missing.
# ---------------------------------------------------------------------------
_PATTERN_ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "brief_pattern.npy",
)
if os.path.exists(_PATTERN_ASSET):
    _pattern = np.load(_PATTERN_ASSET)
else:  # pragma: no cover - fallback for fresh checkouts
    _pat_rng = np.random.default_rng(0x0B1EF)
    _sigma = (2 * PATCH_RADIUS + 1) / 5.0
    _pattern = np.clip(
        _pat_rng.normal(0.0, _sigma, size=(DESC_BITS, 2, 2)),
        -PATCH_RADIUS + 1, PATCH_RADIUS - 1,
    )
BRIEF_PATTERN = jnp.asarray(_pattern, jnp.float32)  # (256, 2 points, xy)

# circular IC-angle patch offsets: all (dx, dy) with dx^2+dy^2 <= r^2
_offs = []
for _dy in range(-PATCH_RADIUS, PATCH_RADIUS + 1):
    for _dx in range(-PATCH_RADIUS, PATCH_RADIUS + 1):
        if _dx * _dx + _dy * _dy <= PATCH_RADIUS * PATCH_RADIUS:
            _offs.append((_dx, _dy))
IC_OFFSETS = jnp.asarray(np.array(_offs, np.float32))          # (P, 2) xy


def _gather_bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (H,W) at xy (...,2) float pixel coords (clamped)."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def _gather_nearest(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample (what OpenCV's ORB does for the test pattern)."""
    h, w = img.shape
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, h - 1)
    return img[y, x]


# IC-angle moment maps: the per-keypoint patch sums m10/m01 are
# cross-correlations of the image with fixed dx/dy kernels.  We use a SQUARE
# patch so both kernels are separable — four 1-D convolutions replace ~1k
# gathers per keypoint (the reference's per-keypoint scalar loop maps
# terribly to TPU).  Square vs the reference's circular patch shifts angles
# slightly; the system is self-consistent so only repeatability matters,
# which the warp-matching tests cover.
_ww = np.arange(-PATCH_RADIUS, PATCH_RADIUS + 1, dtype=np.float32)
_ONES_K = jnp.asarray(np.ones_like(_ww))
_RAMP_K = jnp.asarray(_ww)


def _conv1d_h(img, k):
    return jax.lax.conv_general_dilated(
        img[None, None, :, :], k[None, None, None, :],
        window_strides=(1, 1), padding="SAME",
    )[0, 0]


def _conv1d_v(img, k):
    return jax.lax.conv_general_dilated(
        img[None, None, :, :], k[None, None, :, None],
        window_strides=(1, 1), padding="SAME",
    )[0, 0]


def ic_moment_maps(img: jnp.ndarray):
    """(H,W) -> (m10 (H,W), m01 (H,W)) via separable 1-D convolutions."""
    col_sum = _conv1d_v(img, _ONES_K)          # sum over dy
    m10 = _conv1d_h(col_sum, _RAMP_K)          # weight dx
    row_sum = _conv1d_h(img, _ONES_K)          # sum over dx
    m01 = _conv1d_v(row_sum, _RAMP_K)          # weight dy
    return m10, m01


def ic_angles_from_maps(m10: jnp.ndarray, m01: jnp.ndarray, xy: jnp.ndarray):
    """Orientation at keypoints from precomputed moment maps (one gather each)."""
    a10 = _gather_nearest(m10, xy)
    a01 = _gather_nearest(m01, xy)
    return jnp.arctan2(a01, a10)


def ic_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation at keypoints xy (N,2) -> angles (N,) rad."""
    m10, m01 = ic_moment_maps(img)
    return ic_angles_from_maps(m10, m01, xy)


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N,256) {0,1} -> (N,8) packed uint32."""
    n = bits.shape[0]
    words = bits.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def brief_descriptors_gather(
    img_blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF via direct image gathers (512 point loads / keypoint)."""
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    # rotate pattern: (N, 256, 2, 2)
    px = BRIEF_PATTERN[None, :, :, 0]
    py = BRIEF_PATTERN[None, :, :, 1]
    rx = c[:, None, None] * px - s[:, None, None] * py
    ry = s[:, None, None] * px + c[:, None, None] * py
    pts = jnp.stack([rx, ry], -1) + xy[:, None, None, :]      # (N,256,2,2)
    vals = _gather_nearest(img_blurred, pts)                  # (N,256,2)
    bits = vals[..., 0] < vals[..., 1]
    return _pack_bits(bits)


def extract_patches(img: jnp.ndarray, xy: jnp.ndarray, radius: int = PATCH_RADIUS
                    ) -> jnp.ndarray:
    """(H,W) + (N,2) -> (N, 2r+1, 2r+1) patches centred on rounded keypoints.

    Row-gather formulation: one gather of full rows (contiguous, HBM-friendly)
    then a take_along_axis column selection — orders of magnitude fewer
    scalar loads than per-pixel gathers on TPU.
    """
    h, w = img.shape
    d = 2 * radius + 1
    x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), radius, w - radius - 1)
    y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), radius, h - radius - 1)
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    rows = img[y0[:, None] + offs[None, :], :]                  # (N, d, W)
    cols = x0[:, None, None] + offs[None, None, :]              # (N, 1, d)
    cols = jnp.broadcast_to(cols, (xy.shape[0], d, d))
    return jnp.take_along_axis(rows, cols, axis=2)              # (N, d, d)


def brief_descriptors_patch(
    img_blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF via per-keypoint patch extraction + in-patch sampling.

    The 512 test samples index into the keypoint's own (31,31) patch with
    take_along_axis over a flat 961-vector — a batched small-domain gather
    that the TPU vectorizes far better than scattered image loads.
    """
    r = PATCH_RADIUS
    d = 2 * r + 1
    h, w = img_blurred.shape
    patches = extract_patches(img_blurred, xy, r).reshape(xy.shape[0], d * d)
    # fractional part of the (clamped) centre: sampling positions must round
    # exactly like the direct-gather formulation round(center + offset)
    x0 = jnp.clip(jnp.round(xy[:, 0]), r, w - r - 1)
    y0 = jnp.clip(jnp.round(xy[:, 1]), r, h - r - 1)
    fx = (xy[:, 0] - x0)[:, None, None]
    fy = (xy[:, 1] - y0)[:, None, None]
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    px = BRIEF_PATTERN[None, :, :, 0]
    py = BRIEF_PATTERN[None, :, :, 1]
    rx = c[:, None, None] * px - s[:, None, None] * py          # (N,256,2)
    ry = s[:, None, None] * px + c[:, None, None] * py
    xi = jnp.clip(jnp.round(rx + fx).astype(jnp.int32) + r, 0, d - 1)
    yi = jnp.clip(jnp.round(ry + fy).astype(jnp.int32) + r, 0, d - 1)
    flat = (yi * d + xi).reshape(xy.shape[0], -1)               # (N,512)
    vals = jnp.take_along_axis(patches, flat, axis=1).reshape(
        xy.shape[0], DESC_BITS, 2
    )
    bits = vals[..., 0] < vals[..., 1]
    return _pack_bits(bits)


def extract_patches_onehot(img_blurred: jnp.ndarray, xy: jnp.ndarray,
                           radius: int = PATCH_RADIUS):
    """Per-keypoint (d,d) patches with ZERO scattered gathers: one contiguous
    row gather + a column one-hot matmul on the MXU.

    TPU gathers run at ~15M scalar loads/s — direct per-pixel patch gathers
    cost ~35 ms/frame; a vmapped dynamic_slice is also scalarized (measured
    +0.7 ms, tools/tpu_measure7.py).  The one-hot contraction formulation is
    the fast path.  Returns (patches (N,d,d) f32, fx (N,), fy (N,)) with
    fx/fy the fractional offsets from the clamped patch centre.
    """
    r = radius
    d = 2 * r + 1
    h, w = img_blurred.shape
    bf = jnp.bfloat16
    x0 = jnp.clip(jnp.round(xy[:, 0]), r, w - r - 1)
    y0 = jnp.clip(jnp.round(xy[:, 1]), r, h - r - 1)
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
    rows = img_blurred[y0.astype(jnp.int32)[:, None] + offs[None, :], :]  # (N,d,W)
    cols = x0.astype(jnp.int32)[:, None] + offs[None, :]                   # (N,d)
    oh_c = (cols[:, None, :] == jnp.arange(w, dtype=jnp.int32)[None, :, None])
    patches = jax.lax.dot_general(
        rows.astype(bf), oh_c.astype(bf),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                                      # (N,d,d)
    return patches, xy[:, 0] - x0, xy[:, 1] - y0


def describe_mxu(img_blurred: jnp.ndarray, xy: jnp.ndarray):
    """Orientation + steered BRIEF with zero scattered gathers — one-hot
    patch extraction (extract_patches_onehot) + one-hot selection sampling
    (describe_patches).  Returns (desc_u32 (N,8), angles (N,))."""
    patches, fx, fy = extract_patches_onehot(img_blurred, xy)
    return describe_patches(patches, fx, fy)


def brief_descriptors_mxu(img_blurred, xy, angles_unused=None):
    return describe_mxu(img_blurred, xy)[0]


# ---------------------------------------------------------------------------
# binned steering: constant selection tables per orientation bin
# ---------------------------------------------------------------------------
NUM_ANGLE_BINS = 64
_binned_tables_cache = {}


def _binned_tables(num_bins: int):
    """Precompute per-bin one-hot selection tables for the rotated pattern.

    The reference steers BRIEF by a 12-bin (30 deg) rotated-pattern lookup
    (orb_extractor: angle discretized, pattern pre-rotated per bin); we use
    64 bins (5.6 deg).  With the bins fixed, the (512,) sample positions per
    bin are compile-time constants, so the per-keypoint one-hot CONSTRUCTION
    (32M compares/frame, 0.65 ms — the describe-stage floor, measured in
    tools/tpu_measure10.py) becomes a row gather of constant tables.
    Returns (oh_y (B,512,d), oh_x (B,512,d)) bfloat16.
    """
    if num_bins not in _binned_tables_cache:
        r = PATCH_RADIUS
        d = 2 * r + 1
        th = np.arange(num_bins) * (2 * np.pi / num_bins)
        c, s = np.cos(th), np.sin(th)
        px = np.asarray(_pattern)[None, :, :, 0]          # (1,256,2)
        py = np.asarray(_pattern)[None, :, :, 1]
        rx = c[:, None, None] * px - s[:, None, None] * py    # (B,256,2)
        ry = s[:, None, None] * px + c[:, None, None] * py
        xi = np.clip(np.round(rx).astype(np.int64) + r, 0, d - 1)
        yi = np.clip(np.round(ry).astype(np.int64) + r, 0, d - 1)
        xi = xi.reshape(num_bins, -1)                          # (B,512)
        yi = yi.reshape(num_bins, -1)
        oh = np.arange(d)[None, None, :]
        import ml_dtypes
        ohy = (yi[:, :, None] == oh).astype(ml_dtypes.bfloat16)
        ohx = (xi[:, :, None] == oh).astype(ml_dtypes.bfloat16)
        # the first call can happen inside a jit trace: build the constants
        # eagerly (numpy in, no traced conversion) or the cache would hold
        # tracers from that trace
        with jax.ensure_compile_time_eval():
            _binned_tables_cache[num_bins] = (jnp.asarray(ohy), jnp.asarray(ohx))
    return _binned_tables_cache[num_bins]


def describe_patches_binned(patches: jnp.ndarray,
                            num_bins: int = NUM_ANGLE_BINS):
    """Orientation + steered BRIEF from (N,d,d) patches with BINNED steering.

    Like describe_patches, but the rotated sample positions come from
    constant per-bin tables (see _binned_tables) selected by the quantized
    IC angle — no per-keypoint one-hot construction.  Sampling is relative
    to the integer patch centre, as in the reference (FAST corners are
    integer-positioned; the reference's pattern lookup has no sub-pixel
    term either).  Returns (desc_u32 (N,8), angles (N,) — continuous).
    """
    r = PATCH_RADIUS
    n = patches.shape[0]
    bf = jnp.bfloat16
    patch = patches.astype(jnp.float32)

    ramp = jnp.arange(-r, r + 1, dtype=jnp.float32)
    m10 = jnp.einsum("nrc,c->n", patch, ramp)
    m01 = jnp.einsum("nrc,r->n", patch, ramp)
    angles = jnp.arctan2(m01, m10)

    step = 2 * np.pi / num_bins
    bins = jnp.mod(jnp.round(angles / step).astype(jnp.int32), num_bins)
    t_y, t_x = _binned_tables(num_bins)
    oh_y = jnp.take(t_y, bins, axis=0)                   # (N,512,d) bf16
    oh_x = jnp.take(t_x, bins, axis=0)
    tmp = jax.lax.dot_general(
        oh_y, patch.astype(bf),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                    # (N,512,d)
    vals = jnp.sum(tmp * oh_x.astype(jnp.float32), axis=-1)
    vals = vals.reshape(n, DESC_BITS, 2)
    bits = vals[..., 0] < vals[..., 1]
    return _pack_bits(bits), angles


def describe_mxu_binned(img_blurred: jnp.ndarray, xy: jnp.ndarray):
    """Zero-gather one-hot patches + binned-steering describe."""
    patches, _, _ = extract_patches_onehot(img_blurred, xy)
    return describe_patches_binned(patches)


def brief_descriptors_mxu_binned(img_blurred, xy, angles_unused=None):
    return describe_mxu_binned(img_blurred, xy)[0]


def describe_patches(patches: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray):
    """Orientation + steered BRIEF from pre-extracted (N,d,d) patches —
    the batched-levels describe stage (impl "mxu2").

    Square IC moments give the orientation; the rotated test pattern is
    sampled by separable one-hot selection contractions (no gathers).  The
    frontend's "mxu2" mode calls this ONCE over all pyramid levels'
    concatenated patches — the per-level formulation dispatches ~15 small
    ops x8 levels whose launch latency dominates (measured 1.86 ms of the
    1.91 ms extraction, tools/tpu_measure6.py).
    Returns (desc_u32 (N,8), angles (N,)).
    """
    r = PATCH_RADIUS
    d = 2 * r + 1
    n = patches.shape[0]
    bf = jnp.bfloat16
    patch = patches.astype(jnp.float32)

    ramp = jnp.arange(-r, r + 1, dtype=jnp.float32)
    m10 = jnp.einsum("nrc,c->n", patch, ramp)
    m01 = jnp.einsum("nrc,r->n", patch, ramp)
    angles = jnp.arctan2(m01, m10)

    c = jnp.cos(angles)
    s = jnp.sin(angles)
    px = BRIEF_PATTERN[None, :, :, 0]
    py = BRIEF_PATTERN[None, :, :, 1]
    rx = c[:, None, None] * px - s[:, None, None] * py
    ry = s[:, None, None] * px + c[:, None, None] * py
    xi = jnp.clip(jnp.round(rx + fx[:, None, None]).astype(jnp.int32) + r, 0, d - 1)
    yi = jnp.clip(jnp.round(ry + fy[:, None, None]).astype(jnp.int32) + r, 0, d - 1)
    xi = xi.reshape(n, -1)                                   # (N,512)
    yi = yi.reshape(n, -1)
    oh_y = (yi[:, :, None] == jnp.arange(d, dtype=jnp.int32)[None, None, :])
    oh_x = (xi[:, :, None] == jnp.arange(d, dtype=jnp.int32)[None, None, :])
    tmp = jax.lax.dot_general(
        oh_y.astype(bf), patch.astype(bf),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                        # (N,512,d)
    vals = jnp.sum(tmp * oh_x.astype(jnp.float32), axis=-1)  # (N,512)
    vals = vals.reshape(n, DESC_BITS, 2)
    bits = vals[..., 0] < vals[..., 1]
    return _pack_bits(bits), angles


# Implementation choice, overridable for A/B measurement via
# OPENVSLAM_TPU_BRIEF=gather|patch|mxu|mxu2.  Unset -> backend-dependent
# default: mxu on TPU, gather on CPU (native gathers are fast there, one-hot
# matmuls are not).  mxu2 batches the describe stage across pyramid levels —
# measured NEUTRAL-to-slightly-slower than per-level mxu on v5e (2.00 vs
# 1.87 ms extract, tools/tpu_measure8.py): the describe stage is
# throughput-bound on its one-hot intermediates, not launch-latency-bound,
# so batching the 8 levels buys nothing.  Kept selectable for other
# backends/shapes.
_BRIEF_IMPLS = {
    "gather": brief_descriptors_gather,
    "patch": brief_descriptors_patch,
    "mxu": brief_descriptors_mxu,
    "mxu2": brief_descriptors_mxu,   # per-level fallback; frontend batches
    "binned": brief_descriptors_mxu_binned,
}
_brief_name = None


def brief_impl_name() -> str:
    global _brief_name
    if _brief_name is None:
        name = os.environ.get("OPENVSLAM_TPU_BRIEF", "")
        if name not in _BRIEF_IMPLS:
            name = "mxu" if jax.default_backend() != "cpu" else "gather"
        _brief_name = name
    return _brief_name


def brief_descriptors(img_blurred, xy, angles):
    return _BRIEF_IMPLS[brief_impl_name()](img_blurred, xy, angles)


def unpack_bits_i8(packed: jnp.ndarray) -> jnp.ndarray:
    """(N,8) u32 -> (N,256) int8 in {0,1} (for MXU Hamming matching)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(packed.shape[0], -1).astype(jnp.int8)
