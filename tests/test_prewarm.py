"""Bucket pre-warming (utils.prewarm): dedupe, background compile, and the
deterministic pose-graph edge bucket that makes prewarmed shapes the ones
the real solver call hits."""
import numpy as np

from openvslam_tpu.utils.prewarm import Prewarmer
import pytest

pytestmark = pytest.mark.smoke


def test_prewarmer_dedupes_and_runs():
    pw = Prewarmer()
    calls = []
    import os
    os.environ["OPENVSLAM_TPU_PREWARM"] = "1"
    try:
        pw.submit("a", lambda: calls.append("a"))
        pw.submit("a", lambda: calls.append("a-again"))
        pw.submit("b", lambda: calls.append("b"))
        pw.drain(timeout=10)
        import time
        time.sleep(0.1)                    # let the last task_done land
    finally:
        os.environ["OPENVSLAM_TPU_PREWARM"] = "0"
    assert calls == ["a", "b"]


def test_prewarmer_disabled_is_noop():
    pw = Prewarmer()
    calls = []
    pw.submit("x", lambda: calls.append("x"))   # env has PREWARM=0 (conftest)
    pw.drain(timeout=2)
    assert calls == []


def test_prewarm_swallows_exceptions():
    import os
    os.environ["OPENVSLAM_TPU_PREWARM"] = "1"
    pw = Prewarmer()
    try:
        pw.submit("boom", lambda: 1 / 0)
        pw.submit("ok", lambda: None)
        pw.drain(timeout=10)
    finally:
        os.environ["OPENVSLAM_TPU_PREWARM"] = "0"
    assert "boom" in pw._seen and "ok" in pw._seen


def test_pose_graph_edge_bucket_deterministic():
    """The E bucket floor (4N) keeps edge-count jitter from changing the
    compiled shape: any edge set up to 4N compiles to the same program."""
    from openvslam_tpu.module.global_optimization_module import (
        GlobalOptimizationModule as G)
    N = G._bkt(37, 8)
    assert N == 64
    # mirrored from _optimize_pose_graph's padding expression
    for n_edges in (1, 50, 200, 256):
        E = max(4 * N, 1 << int(np.ceil(np.log2(max(n_edges, 2)))))
        assert E == 4 * N
