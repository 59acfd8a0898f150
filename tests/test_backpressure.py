"""Keyframe-insertion backpressure (ref keyframe_inserter: the mapping
queue gates new keyframes).

A mapper slower than the keyframe rate must not accumulate an unbounded
queue: unprocessed keyframes carry unculled stereo depth seeds that
balloon the live landmark set past the device local-map capacity and
collapse tracking (observed at 800-kpt city scale).  `wait_for_backlog`
paces the tracking thread to the mapper's real throughput — except while
the mapper is PAUSED (loop correction in flight, or a viewer pause): the
queue cannot shrink then, so waiting would burn the full timeout on every
fed frame (r4 city artifact: 30 s/frame stalls).
"""
import threading
import time

import pytest

from openvslam_tpu.system import _AsyncMapperProxy


class _GatedMapper:
    """Mapper stub whose process_keyframe blocks until `gate` is set —
    queue contents are deterministic, not a race against worker startup."""

    def __init__(self):
        self.gate = threading.Event()
        self.entered = threading.Event()   # worker is inside process_keyframe
        self.processed = []
        self._next = 0

    def store_keyframe(self, frame):
        kf = self._next
        self._next += 1
        return kf

    def process_keyframe(self, kf, run_ba=True):
        self.entered.set()
        assert self.gate.wait(timeout=30.0)
        self.processed.append((kf, run_ba))


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
    m = _GatedMapper()
    proxy = _AsyncMapperProxy(m, threading.RLock())
    assert proxy.backlog == 0
    for i in range(4):
        proxy.insert_keyframe(frame=i)
    assert m.entered.wait(timeout=5.0)
    # the worker is parked inside process_keyframe(0); 1..3 are queued
    assert proxy.backlog == 3
    m.gate.set()
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
    drained = proxy.wait_for_backlog(max_backlog=1, timeout=10.0)
    waited = time.time() - t0
    assert drained
    assert proxy.backlog <= 1
    # had to wait for at least one slow process_keyframe to finish
    assert waited > 0.03, waited
    proxy.drain()


@pytest.mark.smoke
def test_backlogged_queue_skips_ba():
    """Abort-on-backlog: only the queue tail runs local BA (ref: local BA
    aborted when new keyframes are waiting)."""
    m = _GatedMapper()
    proxy = _AsyncMapperProxy(m, threading.RLock())
    for i in range(3):
        proxy.insert_keyframe(frame=i)
    assert m.entered.wait(timeout=5.0)   # keyframe 0 is in flight
    assert proxy.backlog == 2            # 1..2 queued behind it
    m.gate.set()
    proxy.drain()
    ran_ba = [ba for _, ba in m.processed]
    assert ran_ba[-1] is True
    assert False in ran_ba[:-1]


@pytest.mark.smoke
def test_wait_for_backlog_early_out_while_paused():
    """A paused mapper (loop correction in flight / viewer pause) cannot
    drain its queue: wait_for_backlog must return immediately instead of
    burning the full timeout per fed frame (r4: every feed call stalled
    30 s while a loop correction held the mapper)."""
    m = _GatedMapper()
    proxy = _AsyncMapperProxy(m, threading.RLock())
    for i in range(4):
        proxy.insert_keyframe(frame=i)
    proxy.pause()
    t0 = time.time()
    drained = proxy.wait_for_backlog(max_backlog=1, timeout=10.0)
    waited = time.time() - t0
    assert not drained
    assert waited < 2.0, waited
    proxy.resume()
    m.gate.set()
    proxy.drain()
    assert [k for k, _ in m.processed] == [0, 1, 2, 3]


@pytest.mark.smoke
def test_pause_wait_joins_inflight_keyframe():
    """pause(wait=True) — the loop worker's pre-correction handshake —
    returns only after the in-flight keyframe finishes, and the queue
    survives the pause/resume cycle."""
    m = _GatedMapper()
    proxy = _AsyncMapperProxy(m, threading.RLock())
    for i in range(3):
        proxy.insert_keyframe(frame=i)
    assert m.entered.wait(timeout=5.0)   # worker is inside keyframe 0
    # release the in-flight keyframe shortly after pause starts waiting
    threading.Timer(0.2, m.gate.set).start()
    t0 = time.time()
    proxy.pause(wait=True)
    waited = time.time() - t0
    assert waited >= 0.15, waited
    assert proxy.paused
    # in-flight keyframe 0 completed, then the worker observed the cleared
    # resume event and parked; 1..2 stay queued across the pause
    assert [k for k, _ in m.processed] == [0]
    time.sleep(0.2)
    assert [k for k, _ in m.processed] == [0]   # parked: nothing new ran
    proxy.resume()
    proxy.drain()
    assert [k for k, _ in m.processed] == [0, 1, 2]


@pytest.mark.smoke
def test_wait_for_backlog_timeout_is_reported():
    m = _GatedMapper()
    proxy = _AsyncMapperProxy(m, threading.RLock())
    for i in range(3):
        proxy.insert_keyframe(frame=i)
    drained = proxy.wait_for_backlog(max_backlog=1, timeout=0.3)
    assert not drained
    assert proxy.timeouts_hit == 1
    m.gate.set()
    proxy.drain()
