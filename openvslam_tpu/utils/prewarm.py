"""Background bucket pre-warming.

The bucketed solvers (global BA, Sim3 pose graph, loop validation, batched
relocalization) compile one XLA program per padded problem shape.  Left
alone, each new bucket compiles lazily at first use — which lands the
multi-second (remote-compile tunnels: minute-class) compile inside the
tracking loop the first time a map outgrows a bucket or the first time
relocalization/loop validation fires (r3 city run: max_track_ms 35.9 s).

``Prewarmer`` runs dummy-shaped calls of those programs on a low-priority
daemon thread, ahead of need:

- at startup: relocalizer stage 1, the smallest loop-validation caps;
- as the map grows: the global-BA / pose-graph buckets the map will need
  next (submitted by the global-optimization module with ~25% headroom).

Each key is compiled at most once per process.  Failures are swallowed
(a prewarm is an optimization, never a correctness dependency).  Disable
with OPENVSLAM_TPU_PREWARM=0 (the test suite does: CPU-backend compiles
are cheap and the background work would contend for the 2-core CI hosts).
"""
from __future__ import annotations

import atexit
import os
import queue
import threading
from typing import Callable, Set

from .log import get_logger

_log = get_logger("prewarm")


def enabled() -> bool:
    return os.environ.get("OPENVSLAM_TPU_PREWARM", "1") != "0"


class Prewarmer:
    def __init__(self):
        self._seen: Set[str] = set()
        self._q: "queue.Queue[tuple]" = queue.Queue()
        self._thread = None
        self._lock = threading.Lock()
        self._idle = threading.Event()      # set while the worker is idle
        self._idle.set()
        self._stopping = False

    def submit(self, key: str, fn: Callable[[], None]):
        """Compile-by-calling fn() on the worker thread, once per key."""
        if not enabled():
            return
        with self._lock:
            if key in self._seen or self._stopping:
                return
            self._seen.add(key)
            if self._thread is None or not self._thread.is_alive():
                # daemon thread + atexit quiesce: abrupt interpreter
                # teardown mid-XLA-compile aborts the process ("FATAL:
                # exception not rethrown"), so exit waits (bounded) for the
                # in-flight compile and drops everything still queued
                self._thread = threading.Thread(
                    target=self._run, daemon=True, name="prewarm")
                self._thread.start()
                atexit.register(self.quiesce)
        self._q.put((key, fn))

    def drain(self, timeout: float = 300.0):
        """Block until the queue is empty AND the worker is idle."""
        import time
        t0 = time.monotonic()
        while not self._q.empty() and time.monotonic() - t0 < timeout:
            time.sleep(0.05)
        self._idle.wait(max(0.0, timeout - (time.monotonic() - t0)))

    def quiesce(self, timeout: float = 180.0):
        """Drop queued work and wait for the in-flight compile to finish —
        called from atexit and System.shutdown; new submits become no-ops."""
        with self._lock:
            self._stopping = True
        try:
            while True:
                self._q.get_nowait()
                self._q.task_done()
        except queue.Empty:
            pass
        self._idle.wait(timeout)

    def _run(self):
        while True:
            key, fn = self._q.get()
            self._idle.clear()
            try:
                import time
                t0 = time.monotonic()
                fn()
                _log.debug("prewarmed %s in %.1f s", key,
                           time.monotonic() - t0)
            except Exception as e:          # noqa: BLE001 — best effort
                _log.debug("prewarm %s failed: %s", key, e)
            finally:
                self._q.task_done()
                if self._q.empty():
                    self._idle.set()


_GLOBAL = Prewarmer()


def prewarmer() -> Prewarmer:
    return _GLOBAL
