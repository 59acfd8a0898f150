"""ctypes bridge to the native host kernels (native/map_core.cpp).

Compiled on demand with g++ (cached); every entry point has a pure-python
fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "map_core.cpp")
_SO = os.path.join(_REPO, "native", "build", "libmapcore.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.covis_count.restype = ctypes.c_int32
        lib.covis_count.argtypes = [i64p, ctypes.c_int64, i64p, i64p,
                                    ctypes.c_int64, ctypes.c_int64,
                                    i64p, i32p, ctypes.c_int64]
        lib.bow_shared_words.restype = ctypes.c_int32
        lib.bow_shared_words.argtypes = [i32p, ctypes.c_int64, i64p, i64p,
                                         ctypes.c_int64, i64p, i32p,
                                         ctypes.c_int64]
        lib.min_median_hamming.restype = ctypes.c_int32
        lib.min_median_hamming.argtypes = [u32p, ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def covis_count(lm_ids: np.ndarray, obs_lm: np.ndarray, obs_kf: np.ndarray,
                exclude_kf: int, max_out: int = 4096):
    """Returns (kf_ids (n,), counts (n,)) of keyframes sharing landmarks."""
    lib = _load()
    lm_ids = np.ascontiguousarray(lm_ids, np.int64)
    obs_lm = np.ascontiguousarray(obs_lm, np.int64)
    obs_kf = np.ascontiguousarray(obs_kf, np.int64)
    if lib is None:
        from collections import defaultdict
        by_lm = defaultdict(list)
        for l, k in zip(obs_lm, obs_kf):
            by_lm[l].append(k)
        counts = defaultdict(int)
        for l in lm_ids:
            for k in by_lm.get(l, ()):
                if k != exclude_kf:
                    counts[k] += 1
        ks = np.fromiter(counts.keys(), np.int64, len(counts))
        vs = np.fromiter(counts.values(), np.int32, len(counts))
        return ks, vs
    out_kf = np.empty(max_out, np.int64)
    out_ct = np.empty(max_out, np.int32)
    n = lib.covis_count(
        lm_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(lm_ids),
        obs_lm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        obs_kf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(obs_lm),
        exclude_kf,
        out_kf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_ct.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
    )
    return out_kf[:n].copy(), out_ct[:n].copy()


def bow_shared_words(query_words: np.ndarray, inv_offsets: np.ndarray,
                     inv_kfs: np.ndarray, max_out: int = 8192):
    lib = _load()
    qw = np.ascontiguousarray(query_words, np.int32)
    io_ = np.ascontiguousarray(inv_offsets, np.int64)
    ik = np.ascontiguousarray(inv_kfs, np.int64)
    if lib is None:
        from collections import defaultdict
        counts = defaultdict(int)
        for w in np.unique(qw[qw >= 0]):
            if w + 1 < len(io_):
                for k in ik[io_[w]:io_[w + 1]]:
                    counts[k] += 1
        ks = np.fromiter(counts.keys(), np.int64, len(counts))
        vs = np.fromiter(counts.values(), np.int32, len(counts))
        return ks, vs
    out_kf = np.empty(max_out, np.int64)
    out_ct = np.empty(max_out, np.int32)
    n = lib.bow_shared_words(
        qw.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(qw),
        io_.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ik.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(io_) - 1,
        out_kf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_ct.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
    )
    return out_kf[:n].copy(), out_ct[:n].copy()


def min_median_hamming(descs_u32: np.ndarray) -> int:
    lib = _load()
    d = np.ascontiguousarray(descs_u32, np.uint32)
    if lib is None:
        x = np.bitwise_count(d[:, None, :] ^ d[None, :, :]).sum(-1)
        return int(np.argmin(np.median(x, axis=1)))
    return int(lib.min_median_hamming(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), d.shape[0]
    ))
