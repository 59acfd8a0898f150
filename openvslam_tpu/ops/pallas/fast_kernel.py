"""Pallas TPU kernel for the FAST-9/16 segment test + score.

The XLA formulation (ops/fast.py) materializes a (H, W, 16) ring tensor in
HBM per threshold; this kernel keeps the whole test in VMEM per row band:
each grid program DMAs one (TILE+2*PAD, W) band from HBM once and computes
BOTH threshold score maps in registers — one HBM read of the image instead
of ~20 (ring stack + windowed cumsums), and no (H,W,16) intermediate.

The contiguous-arc test is unrolled: 16 start positions x 9-long windowed
sums on the VPU.  Mosaic alignment rules (validated on the axon v5e
backend): DMA slices must be 8-row aligned, so bands carry PAD=8 halo rows
(>= the 3-px FAST ring radius) and images are padded to (TILE_H | 8)-row /
128-col multiples before the call.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import fast as fast_ref

_CIRCLE = fast_ref._CIRCLE
_ARC = fast_ref._ARC
TILE_H = 32     # 32 keeps the prefix-sum live set inside the 16M VMEM stack
HALO = 3        # FAST ring radius (rows/cols of true halo needed)
PAD = 8         # band halo actually carried: 8-row aligned for Mosaic DMA


def _fast_band_kernel(img_hbm, hi_ref, lo_ref, band_ref, sem,
                      *, thr_hi, thr_lo, tile_h, width, true_w):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, tile_h + 2 * PAD), :],
        band_ref, sem,
    )
    copy.start()
    copy.wait()
    band = band_ref[:]

    nrows = tile_h + 2 * PAD

    # one row-roll per distinct dy (7), then the column roll per offset —
    # 23 rolls instead of 32
    row_cache = {}
    for dy, _ in _CIRCLE:
        if dy not in row_cache:
            row_cache[dy] = pltpu.roll(band, (-dy) % nrows, 0)
    center = band[PAD:PAD + tile_h, :]
    diffs = []
    for dy, dx in _CIRCLE:
        r = row_cache[dy]
        if dx:
            r = pltpu.roll(r, (-dx) % width, 1)
        diffs.append(r[PAD:PAD + tile_h, :] - center)

    def score(thr):
        # contiguous-arc test via circular prefix sums: windowed sum and
        # windowed pass-count come from ONE sequential prefix each (~2x
        # fewer VPU ops than accumulating all 16 9-long windows directly;
        # same structure as the XLA formulation's cumsum)
        def arc(mag):
            ext = mag + mag[:_ARC - 1]
            zero = jnp.zeros_like(center)
            cm = [zero]
            cf = [zero]
            for m in ext:
                cm.append(cm[-1] + m)
                cf.append(cf[-1] + (m > 0.0).astype(jnp.float32))
            best = zero
            for s in range(16):
                wm = cm[s + _ARC] - cm[s]
                wf = cf[s + _ARC] - cf[s]
                best = jnp.maximum(best, jnp.where(wf >= float(_ARC), wm, 0.0))
            return best

        bright = arc([jnp.maximum(d - thr, 0.0) for d in diffs])
        dark = arc([jnp.maximum(-d - thr, 0.0) for d in diffs])
        return jnp.maximum(bright, dark)

    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, width), 1)
    inside = (col >= HALO) & (col < true_w - HALO)
    hi_ref[:] = jnp.where(inside, score(jnp.float32(thr_hi)), 0.0)
    lo_ref[:] = jnp.where(inside, score(jnp.float32(thr_lo)), 0.0)


@functools.partial(jax.jit, static_argnames=("thr_hi", "thr_lo", "interpret"))
def fast_score_maps_pallas(img: jnp.ndarray, thr_hi: float, thr_lo: float,
                           interpret: bool = False):
    """(H, W) f32 -> (hi, lo) score maps (any H/W; padded internally)."""
    h0, w0 = img.shape
    h = ((h0 + TILE_H - 1) // TILE_H) * TILE_H
    w = ((w0 + 127) // 128) * 128
    padded = jnp.pad(img, ((PAD, PAD + h - h0), (0, w - w0)))
    kernel = functools.partial(
        _fast_band_kernel, thr_hi=thr_hi, thr_lo=thr_lo,
        tile_h=TILE_H, width=w, true_w=w0,
    )
    hi, lo = pl.pallas_call(
        kernel,
        grid=(h // TILE_H,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((TILE_H, w), lambda i: (i, 0)),
            pl.BlockSpec((TILE_H, w), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * PAD, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    # crop padding; zero the vertical borders (horizontal in-kernel)
    hi = hi[:h0, :w0]
    lo = lo[:h0, :w0]
    row = jnp.arange(h0)[:, None]
    edge = (row >= HALO) & (row < h0 - HALO)
    return jnp.where(edge, hi, 0.0), jnp.where(edge, lo, 0.0)

