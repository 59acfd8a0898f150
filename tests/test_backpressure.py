"""Keyframe-insertion backpressure (ref keyframe_inserter: the mapping
queue gates new keyframes).

A mapper slower than the keyframe rate must not accumulate an unbounded
queue: unprocessed keyframes carry unculled stereo depth seeds that
balloon the live landmark set past the device local-map capacity and
collapse tracking (observed at 800-kpt city scale).  `wait_for_backlog`
paces the tracking thread to the mapper's real throughput.
"""
import threading
import time

import pytest

from openvslam_tpu.system import _AsyncMapperProxy


class _SlowMapper:
    """Mapper stub whose process_keyframe takes `delay` seconds."""

    def __init__(self, delay):
        self.delay = delay
        self.processed = []
        self._next = 0

    def store_keyframe(self, frame):
        kf = self._next
        self._next += 1
        return kf

    def process_keyframe(self, kf, run_ba=True):
        time.sleep(self.delay)
        self.processed.append((kf, run_ba))


@pytest.mark.smoke
def test_backlog_counts_queued_keyframes():
    m = _SlowMapper(delay=0.15)
    proxy = _AsyncMapperProxy(m, threading.RLock())
    assert proxy.backlog == 0
    for i in range(4):
        proxy.insert_keyframe(frame=i)
    # one is being processed, the rest are queued
    assert proxy.backlog >= 2
    proxy.drain()
    assert proxy.backlog == 0
    assert [k for k, _ in m.processed] == [0, 1, 2, 3]


@pytest.mark.smoke
def test_wait_for_backlog_paces_insertion():
    m = _SlowMapper(delay=0.1)
    proxy = _AsyncMapperProxy(m, threading.RLock())
    for i in range(3):
        proxy.insert_keyframe(frame=i)
    t0 = time.time()
    proxy.wait_for_backlog(max_backlog=1, timeout=10.0)
    waited = time.time() - t0
    assert proxy.backlog <= 1
    # had to wait for at least one slow process_keyframe to finish
    assert waited > 0.03, waited
    proxy.drain()


@pytest.mark.smoke
def test_backlogged_queue_skips_ba():
    """Abort-on-backlog: only the queue tail runs local BA (ref: local BA
    aborted when new keyframes are waiting)."""
    m = _SlowMapper(delay=0.05)
    proxy = _AsyncMapperProxy(m, threading.RLock())
    for i in range(3):
        proxy.insert_keyframe(frame=i)
    proxy.drain()
    ran_ba = [ba for _, ba in m.processed]
    assert ran_ba[-1] is True
    assert False in ran_ba[:-1]
