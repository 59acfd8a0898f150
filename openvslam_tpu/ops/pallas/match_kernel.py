"""Pallas TPU kernel: fused projection-gated descriptor matching.

The XLA formulation (ops/match.py + ops/match.projection_gate) materializes
several (L, K) intermediates in HBM per match — the Hamming matrix, the
projection/scale gates, the masked distance, and the top-k/argmin inputs —
~10 full passes over 16 MB at L=4096, K=1024 (measured 1.12 ms of the
4.2 ms fused tracking step, docs/kernels.md (measured-trajectory history; probe: tools/tpu_probe.py)).

This kernel tiles the landmark rows over a 1-D grid and keeps the ENTIRE
distance matrix in VMEM: each program computes one (TILE_L, K) int8 MXU
contraction, applies the projection-radius + octave + validity gates
in-registers, reduces row-wise best/second-best (packed value<<shift|index
min-reductions, tie-breaking identical to argmin/top_k), and emits a
per-tile packed column minimum for the cross-check.  HBM traffic drops to
the descriptors + two small outputs.

Semantics are exactly `ops.match.match_descriptors(..., gate=projection &
scale & validity)` — the wrapper below reproduces the reference matcher's
acceptance logic (max_dist, Lowe ratio, cross-check; ref match/projection)
bit-for-bit, validated by tests/test_pallas_match.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import match as M

# in-kernel sentinel distance: larger than any true Hamming distance (<=256)
# and small enough that packed (d * MUL + index) stays well inside int32
_LARGE_D = 1023


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _match_kernel(a_desc_ref, b_desc_ref, a_meta_ref, b_meta_ref,
                  row_ref, col_ref, *, tile_l, k, col_mul, row_mul):
    i = pl.program_id(0)

    a = a_desc_ref[:]                                  # (TILE_L, 256) i8
    b = b_desc_ref[:]                                  # (K, 256) i8
    dots = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (TILE_L, K)

    meta = a_meta_ref[:]                               # (TILE_L, 8) f32
    u, v = meta[:, 0:1], meta[:, 1:2]
    r2 = meta[:, 2:3]
    pred = meta[:, 3:4]
    avis = meta[:, 4:5]
    na = meta[:, 5:6].astype(jnp.int32)                # popcounts precomputed
    bm = b_meta_ref[:]                                 # (8, K) f32
    bx, by = bm[0:1, :], bm[1:2, :]
    blvl, bval = bm[2:3, :], bm[3:4, :]
    nb = bm[4:5, :].astype(jnp.int32)
    ham = na + nb - 2 * dots

    dx = u - bx
    dy = v - by
    gate = (dx * dx + dy * dy < r2) & (avis > 0.0) & (bval > 0.0)
    gate &= (jnp.abs(blvl - pred) <= 1.0) | (pred < 0.0)

    d = jnp.where(gate, ham, _LARGE_D)                 # (TILE_L, K) i32

    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_l, k), 1)
    packed = d * col_mul + cols
    best = jnp.min(packed, axis=1, keepdims=True)      # (TILE_L, 1)
    best_i = best % col_mul
    second = jnp.min(jnp.where(cols == best_i, _LARGE_D, d),
                     axis=1, keepdims=True)
    row_ref[:] = jnp.concatenate(
        [best, second, jnp.zeros((tile_l, 6), jnp.int32)], axis=1)

    # column minimum for the cross-check, accumulated across the sequential
    # grid into one persistent (8, k) VMEM block (TPU requires sublane>=8;
    # only row 0 carries data)
    @pl.when(i == 0)
    def _init():
        col_ref[:] = jnp.full((8, k), jnp.iinfo(jnp.int32).max, jnp.int32)

    rows = i * tile_l + jax.lax.broadcasted_iota(jnp.int32, (tile_l, k), 0)
    colmin = jnp.min(d * row_mul + rows, axis=0, keepdims=True)
    col_ref[0:1, :] = jnp.minimum(col_ref[0:1, :], colmin)


@functools.partial(
    jax.jit,
    static_argnames=("max_dist", "ratio", "cross_check", "interpret"),
)
def projection_match_pallas(
    a_desc_i8, b_desc_i8, a_uv, a_vis, a_radius, a_pred_level,
    b_xy, b_level, b_valid,
    max_dist: int = M.HAMMING_DIST_THR_HIGH,
    ratio=None, cross_check: bool = True, interpret: bool = False,
):
    """Fused equivalent of

        gate  = projection_gate(a_uv, a_vis, b_xy, a_radius)
        gate &= scale_gate | (a_pred_level < 0)
        match_descriptors(a_desc, b_desc, a_vis, b_valid, gate,
                          max_dist, ratio, cross_check)

    Returns (idx_b (L,) int32 [-1 unmatched], dist (L,) int32 [M.LARGE]).
    """
    L, K = a_desc_i8.shape[0], b_desc_i8.shape[0]
    tile_l = 512 if K <= 1024 else 256
    Lp = max(tile_l, -(-L // tile_l) * tile_l)
    Kp = -(-K // 128) * 128
    col_mul = _next_pow2(max(Kp, 2))
    row_mul = _next_pow2(max(Lp, 2))
    assert col_mul * 1024 < 2**31 and row_mul * 1024 < 2**31

    a_desc = (a_desc_i8 if Lp == L
              else jnp.zeros((Lp, 256), jnp.int8).at[:L].set(a_desc_i8))
    b_desc = (b_desc_i8 if Kp == K
              else jnp.zeros((Kp, 256), jnp.int8).at[:K].set(b_desc_i8))
    r = a_radius if jnp.ndim(a_radius) > 0 else jnp.full(L, a_radius)
    zL = jnp.zeros(L, jnp.float32)
    # one stack + one pad, not per-column dynamic-update-slices (profiled:
    # five 11 us DUS ops per call on the (4096,8) buffer)
    a_meta = jnp.stack([
        a_uv[:, 0], a_uv[:, 1], r.astype(jnp.float32) ** 2,
        a_pred_level.astype(jnp.float32), a_vis.astype(jnp.float32),
        jnp.sum(a_desc_i8.astype(jnp.int32), axis=1).astype(jnp.float32),
        zL, zL,
    ], axis=1)                                               # (L, 8)
    if Lp != L:
        a_meta = jnp.pad(a_meta, ((0, Lp - L), (0, 0)))
    zK = jnp.zeros(K, jnp.float32)
    b_meta = jnp.stack([
        b_xy[:, 0], b_xy[:, 1], b_level.astype(jnp.float32),
        b_valid.astype(jnp.float32),
        jnp.sum(b_desc_i8.astype(jnp.int32), axis=1).astype(jnp.float32),
        zK, zK, zK,
    ], axis=0)                                               # (8, K)
    if Kp != K:
        b_meta = jnp.pad(b_meta, ((0, 0), (0, Kp - K)))

    grid = (Lp // tile_l,)
    row_out, col_out = pl.pallas_call(
        functools.partial(_match_kernel, tile_l=tile_l, k=Kp,
                          col_mul=col_mul, row_mul=row_mul),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_l, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, 256), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_l, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_l, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, 8), jnp.int32),
            jax.ShapeDtypeStruct((8, Kp), jnp.int32),
        ],
        interpret=interpret,
    )(a_desc, b_desc, a_meta, b_meta)

    packed = row_out[:L, 0]
    best_i = packed % col_mul
    best_d = packed // col_mul
    second_d = row_out[:L, 1]
    ok = best_d <= max_dist
    if ratio is not None:
        ok &= best_d.astype(jnp.float32) <= ratio * second_d.astype(jnp.float32)
    if cross_check:
        col_row = (col_out[0] % row_mul)[:K]
        ok &= col_row[best_i] == jnp.arange(L)
    return jnp.where(ok, best_i, -1), jnp.where(ok, best_d, M.LARGE)
