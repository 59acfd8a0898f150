"""Oriented rBRIEF description: IC-angle orientation + rotated binary tests.

TPU-native redesign of the reference's ``orb_extractor`` describe stage
(SURVEY.md §2.1 ORB extractor row): per-keypoint work is expressed as batched
gathers + elementwise math over a fixed keypoint capacity, not a per-keypoint
loop.

Test patterns (selectable; see ``get_pattern``):

* ``"learned"`` (default) — ORB's pattern-learning procedure re-run on
  synthetic patches (tools/make_brief_pattern.py: candidate pairs in the
  patch disc, keep 256 tests with mean ~0.5 and low mutual correlation),
  shipped as assets/brief_pattern.npy.  Self-consistent and validated
  behaviorally (warp matching, Hamming separation, end-to-end ATE).
* ``"cv"`` — the reference's actual ``bit_pattern_31`` test pairs,
  recovered empirically from the opencv-python oracle
  (tools/recover_orb_pattern.py; 99.88% of descriptor bits match
  cv2.ORB's output on held-out images, the residual being cv2's internal
  +-1 blur rounding).  Use this when descriptors must be comparable with
  maps/vocabularies produced by the reference (io/msgpack_compat).

Orientation steering rotates the pattern continuously instead of the
reference's 30-degree lookup discretization (the binned path quantizes to
64 bins).
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
_ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets",
)
_PATTERN_ASSETS = {
    "learned": os.path.join(_ASSET_DIR, "brief_pattern.npy"),
    "cv": os.path.join(_ASSET_DIR, "orb_pattern_cv.npy"),
}
_pattern_cache: dict = {}


def _load_pattern_np(name: str) -> np.ndarray:
    if name not in _PATTERN_ASSETS:
        raise ValueError(
            f"unknown descriptor pattern {name!r}; valid: "
            f"{sorted(_PATTERN_ASSETS)}")
    path = _PATTERN_ASSETS[name]
    if os.path.exists(path):
        return np.load(path).astype(np.float32)
    if name == "cv":
        raise FileNotFoundError(
            "assets/orb_pattern_cv.npy missing — run tools/recover_orb_pattern.py"
        )
    # pragma: no cover - fallback for fresh checkouts missing the learned asset
    _pat_rng = np.random.default_rng(0x0B1EF)
    _sigma = (2 * PATCH_RADIUS + 1) / 5.0
    return np.clip(
        _pat_rng.normal(0.0, _sigma, size=(DESC_BITS, 2, 2)),
        -PATCH_RADIUS + 1, PATCH_RADIUS - 1,
    ).astype(np.float32)


def get_pattern_np(name: str = "learned") -> np.ndarray:
    if name not in _pattern_cache:
        _pattern_cache[name] = _load_pattern_np(name)
    return _pattern_cache[name]


def get_pattern(name: str = "learned") -> jnp.ndarray:
    """(256, 2 points, xy) f32 test pattern by name ("learned" | "cv")."""
    key = ("jnp", name)
    if key not in _pattern_cache:
        with jax.ensure_compile_time_eval():
            _pattern_cache[key] = jnp.asarray(get_pattern_np(name))
    return _pattern_cache[key]


def pattern_radius(name: str = "learned") -> int:
    """Patch radius needed so ROTATED pattern points stay inside the patch.

    The learned pattern lives in the radius-15 disc (rotation-invariant);
    the reference's bit_pattern_31 has points up to |q| ~ 17, so its rotated
    samples can leave a 31x31 window — cv2 samples the image directly with
    no clipping, and the patch-based describe paths must carry a wide-enough
    patch to reproduce that (IC moments still use the central 31x31)."""
    key = ("radius", name)
    if key not in _pattern_cache:
        pat = get_pattern_np(name)
        norm = float(np.sqrt((pat**2).sum(-1)).max())
        _pattern_cache[key] = max(PATCH_RADIUS, int(np.ceil(norm)))
    return _pattern_cache[key]


_pattern = get_pattern_np("learned")
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


# HIGHEST precision: TPU convs default to bf16-rounded operands, and the
# second separable pass runs over column/row sums (magnitude ~8k) that bf16
# cannot represent exactly — the resulting moment noise is ~2 deg of IC
# angle, a platform-dependent descriptor perturbation (CPU f32 convs are
# exact).  These 1-D convs are bandwidth-trivial; precision costs nothing
# measurable.
def _conv1d_h(img, k):
    return jax.lax.conv_general_dilated(
        img[None, None, :, :], k[None, None, None, :],
        window_strides=(1, 1), padding="SAME",
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]


def _conv1d_v(img, k):
    return jax.lax.conv_general_dilated(
        img[None, None, :, :], k[None, None, :, None],
        window_strides=(1, 1), padding="SAME",
        precision=jax.lax.Precision.HIGHEST,
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
    img_blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray,
    pattern_name: str = "learned",
) -> jnp.ndarray:
    """Steered BRIEF via direct image gathers (512 point loads / keypoint)."""
    pat = get_pattern(pattern_name)
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    # rotate pattern: (N, 256, 2, 2)
    px = pat[None, :, :, 0]
    py = pat[None, :, :, 1]
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
    img_blurred: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray,
    pattern_name: str = "learned",
) -> jnp.ndarray:
    """Steered BRIEF via per-keypoint patch extraction + in-patch sampling.

    The 512 test samples index into the keypoint's own patch with
    take_along_axis over a flat vector — a batched small-domain gather
    that the TPU vectorizes far better than scattered image loads.  The
    patch radius follows the pattern (bit_pattern_31's rotated points
    reach |q|~18, beyond the 31x31 window).
    """
    r = pattern_radius(pattern_name)
    d = 2 * r + 1
    h, w = img_blurred.shape
    patches = extract_patches(img_blurred, xy, r).reshape(xy.shape[0], d * d)
    # fractional part of the (clamped) centre: sampling positions must round
    # exactly like the direct-gather formulation round(center + offset)
    x0 = jnp.clip(jnp.round(xy[:, 0]), r, w - r - 1)
    y0 = jnp.clip(jnp.round(xy[:, 1]), r, h - r - 1)
    fx = (xy[:, 0] - x0)[:, None, None]
    fy = (xy[:, 1] - y0)[:, None, None]
    pat = get_pattern(pattern_name)
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    px = pat[None, :, :, 0]
    py = pat[None, :, :, 1]
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
    +0.7 ms, docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)).  The one-hot contraction formulation is
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


def describe_mxu(img_blurred: jnp.ndarray, xy: jnp.ndarray,
                 pattern_name: str = "learned"):
    """Orientation + steered BRIEF with zero scattered gathers — one-hot
    patch extraction (extract_patches_onehot) + one-hot selection sampling
    (describe_patches).  Returns (desc_u32 (N,8), angles (N,))."""
    patches, fx, fy = extract_patches_onehot(
        img_blurred, xy, pattern_radius(pattern_name))
    return describe_patches(patches, fx, fy, pattern_name)


def brief_descriptors_mxu(img_blurred, xy, angles_unused=None,
                          pattern_name: str = "learned"):
    return describe_mxu(img_blurred, xy, pattern_name)[0]


# ---------------------------------------------------------------------------
# binned steering: constant selection tables per orientation bin
# ---------------------------------------------------------------------------
NUM_ANGLE_BINS = 64
_binned_tables_cache = {}


def _binned_tables(num_bins: int, pattern_name: str = "learned"):
    """Precompute per-bin one-hot selection tables for the rotated pattern.

    The reference steers BRIEF by a 12-bin (30 deg) rotated-pattern lookup
    (orb_extractor: angle discretized, pattern pre-rotated per bin); we use
    64 bins (5.6 deg).  With the bins fixed, the (512,) sample positions per
    bin are compile-time constants, so the per-keypoint one-hot CONSTRUCTION
    (32M compares/frame, 0.65 ms — the describe-stage floor, measured in
    docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)) becomes a row gather of constant tables.
    Returns (oh_y (B,512,d), oh_x (B,512,d)) bfloat16.
    """
    key = (num_bins, pattern_name)
    if key not in _binned_tables_cache:
        r = pattern_radius(pattern_name)
        d = 2 * r + 1
        th = np.arange(num_bins) * (2 * np.pi / num_bins)
        c, s = np.cos(th), np.sin(th)
        pat = get_pattern_np(pattern_name)
        px = pat[None, :, :, 0]                           # (1,256,2)
        py = pat[None, :, :, 1]
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
            _binned_tables_cache[key] = (jnp.asarray(ohy), jnp.asarray(ohx))
    return _binned_tables_cache[key]


def describe_patches_binned(patches: jnp.ndarray,
                            num_bins: int = NUM_ANGLE_BINS,
                            pattern_name: str = "learned"):
    """Orientation + steered BRIEF from (N,d,d) patches with BINNED steering.

    Like describe_patches, but the rotated sample positions come from
    constant per-bin tables (see _binned_tables) selected by the quantized
    IC angle — no per-keypoint one-hot construction.  Sampling is relative
    to the integer patch centre, as in the reference (FAST corners are
    integer-positioned; the reference's pattern lookup has no sub-pixel
    term either).  Returns (desc_u32 (N,8), angles (N,) — continuous).
    """
    d = patches.shape[1]
    r = (d - 1) // 2
    n = patches.shape[0]
    bf = jnp.bfloat16
    patch = patches.astype(jnp.float32)

    mo = r - PATCH_RADIUS
    mpatch = patch[:, mo:d - mo, mo:d - mo] if mo else patch
    ramp = jnp.arange(-PATCH_RADIUS, PATCH_RADIUS + 1, dtype=jnp.float32)
    m10 = jnp.einsum("nrc,c->n", mpatch, ramp)
    m01 = jnp.einsum("nrc,r->n", mpatch, ramp)
    angles = jnp.arctan2(m01, m10)

    step = 2 * np.pi / num_bins
    bins = jnp.mod(jnp.round(angles / step).astype(jnp.int32), num_bins)
    t_y, t_x = _binned_tables(num_bins, pattern_name)
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


def describe_mxu_binned(img_blurred: jnp.ndarray, xy: jnp.ndarray,
                        pattern_name: str = "learned"):
    """Zero-gather one-hot patches + binned-steering describe."""
    patches, _, _ = extract_patches_onehot(
        img_blurred, xy, pattern_radius(pattern_name))
    return describe_patches_binned(patches, pattern_name=pattern_name)


def brief_descriptors_mxu_binned(img_blurred, xy, angles_unused=None,
                                 pattern_name: str = "learned"):
    return describe_mxu_binned(img_blurred, xy, pattern_name)[0]


def describe_patches(patches: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                     pattern_name: str = "learned"):
    """Orientation + steered BRIEF from pre-extracted (N,d,d) patches —
    the batched-levels describe stage (impl "mxu2").

    Square IC moments give the orientation; the rotated test pattern is
    sampled by separable one-hot selection contractions (no gathers).  The
    frontend's "mxu2" mode calls this ONCE over all pyramid levels'
    concatenated patches — the per-level formulation dispatches ~15 small
    ops x8 levels whose launch latency dominates (measured 1.86 ms of the
    1.91 ms extraction, docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)).
    Returns (desc_u32 (N,8), angles (N,)).
    """
    d = patches.shape[1]
    r = (d - 1) // 2          # patch radius (> PATCH_RADIUS for "cv")
    n = patches.shape[0]
    bf = jnp.bfloat16
    patch = patches.astype(jnp.float32)

    # IC moments always over the central 31x31 window (the angle definition
    # is independent of how far the descriptor pattern reaches)
    mo = r - PATCH_RADIUS
    mpatch = patch[:, mo:d - mo, mo:d - mo] if mo else patch
    ramp = jnp.arange(-PATCH_RADIUS, PATCH_RADIUS + 1, dtype=jnp.float32)
    m10 = jnp.einsum("nrc,c->n", mpatch, ramp)
    m01 = jnp.einsum("nrc,r->n", mpatch, ramp)
    angles = jnp.arctan2(m01, m10)

    pat = get_pattern(pattern_name)
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    px = pat[None, :, :, 0]
    py = pat[None, :, :, 1]
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
# 1.87 ms extract, docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)): the describe stage is
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


def brief_descriptors(img_blurred, xy, angles, pattern_name: str = "learned"):
    return _BRIEF_IMPLS[brief_impl_name()](img_blurred, xy, angles, pattern_name)


def unpack_bits_i8(packed: jnp.ndarray) -> jnp.ndarray:
    """(N,8) u32 -> (N,256) int8 in {0,1} (for MXU Hamming matching)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(packed.shape[0], -1).astype(jnp.int8)
