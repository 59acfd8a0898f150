"""Image pyramid + Gaussian blur (ref ``feature/orb_extractor``: 8 levels, x1.2).

Images are float32 in [0,255], shape (H, W).  Level shapes are static
(computed from the config at trace time), so one jitted program handles the
whole pyramid.  Resize uses bilinear interpolation like cv::resize.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(h: int, w: int, num_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [
        (max(8, int(round(h / scale**l))), max(8, int(round(w / scale**l))))
        for l in range(num_levels)
    ]


def scale_factors(num_levels: int, scale: float):
    return [scale**l for l in range(num_levels)]


def build_pyramid(img: jnp.ndarray, num_levels: int, scale: float):
    """(H,W) f32 -> list of (Hl,Wl) f32, successively resized (like the ref,
    each level resized from the previous for proper low-pass behavior).

    Levels are INTEGER-VALUED (rounded to the 0..255 grid, as cv::resize on
    u8 images produces) and the resize contraction runs at HIGHEST matmul
    precision.  Both matter for platform determinism: jax.image.resize
    lowers to per-axis matmuls, which on TPU default to bf16-rounded
    operands — leaving levels fractional put ~0.5-gray-level platform noise
    under every FAST compare and descriptor bit (the r3 city run's
    deterministic TPU-only tracking loss: CPU survived the same sequence).
    With integer levels every downstream compare/moment is exact integer
    arithmetic on both backends."""
    h, w = img.shape
    shapes = level_shapes(h, w, num_levels, scale)
    levels = [img]
    for l in range(1, num_levels):
        prev = levels[-1]
        levels.append(quantize_u8_grid(jax.image.resize(
            prev, shapes[l], method="linear", antialias=True,
            precision=jax.lax.Precision.HIGHEST)))
    return levels


def quantize_u8_grid(img: jnp.ndarray) -> jnp.ndarray:
    """Round to the integer 0..255 grid, staying f32 (cv2 u8 semantics)."""
    return jnp.clip(jnp.round(img), 0.0, 255.0)


def _gaussian_kernel1d(ksize: int, sigma: float):
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with replicate padding (cv::GaussianBlur(7,7,2)).

    Implemented as static shift-and-add on the VPU rather than
    conv_general_dilated: XLA lowers 1-channel HW convs onto the MXU with a
    wasted 128-lane channel dimension (measured 5 ms for the 8-level pyramid
    on v5e; this form runs in ~0.1 ms)."""
    import numpy as _np

    kk = _np.exp(-0.5 * ((_np.arange(ksize) - ksize // 2) / sigma) ** 2)
    kk = (kk / kk.sum()).astype(_np.float32)        # static trace-time weights
    r = ksize // 2
    h, w = img.shape
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    x = sum(float(kk[i]) * jax.lax.slice_in_dim(x, i, i + h, axis=0)
            for i in range(ksize))
    x = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = sum(float(kk[i]) * jax.lax.slice_in_dim(x, i, i + w, axis=1)
            for i in range(ksize))
    # cv::GaussianBlur on u8 rounds back to u8; quantizing keeps every
    # downstream descriptor compare exact integer arithmetic (and makes the
    # bf16 operand casts in the one-hot describe matmuls lossless — integers
    # <= 255 are exactly representable in bf16), so descriptors are
    # platform-identical instead of flipping on near-tie sample pairs
    return quantize_u8_grid(x)
