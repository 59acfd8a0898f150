"""Scoped matmul precision for geometry-critical code.

XLA lowers f32 x f32 dots/convs on TPU to ONE bf16 MXU pass by default.
That is the right call for the frontend's big contractions (patch one-hot
extraction, descriptor Hamming popcounts — they cast to bf16 deliberately),
but it corrupts normal-equation and DLT accumulations whose contraction
dimension spans thousands of rows (A^T A in the 8-point/DLT fits, J^T J in
the LM/BA solvers): observed on-device as two-view initialization never
succeeding (ref solve/* + optimize/* are plain f64-capable CPU Eigen, which
never faces this).

``geometry_precision`` pins full f32 precision at TRACE time for the
decorated function and everything it calls, so the pin scopes to the
geometry subgraph even inside a larger jitted program (e.g. the fused
per-frame TrackStep keeps one-pass bf16 for extraction/matching while its
pose-LM core runs pinned).  Override with OPENVSLAM_TPU_GEOMETRY_PRECISION.
"""
from __future__ import annotations

import functools
import os

import jax

_MODE = os.environ.get("OPENVSLAM_TPU_GEOMETRY_PRECISION", "highest")


def geometry_precision(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(_MODE):
            return fn(*args, **kwargs)

    return wrapped
