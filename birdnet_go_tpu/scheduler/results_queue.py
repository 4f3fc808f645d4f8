"""Bounded results queue with drop accounting.

Reference contract: classifier.ResultsQueue, capacity 100, non-blocking
send with drop counters surfaced to health (internal/classifier/queue.go:22,
internal/analysis/process.go:423-470). Drops are the designed overload
behavior — the producer (device loop) must never block.
"""

from __future__ import annotations

import queue
import threading

DEFAULT_CAPACITY = 100


class ResultsQueue:
    def __init__(self, capacity: int = DEFAULT_CAPACITY):
        self._q: queue.Queue = queue.Queue(maxsize=capacity)
        self.dropped = 0
        self.enqueued = 0
        self._lock = threading.Lock()

    def put(self, item) -> bool:
        try:
            self._q.put_nowait(item)
        except queue.Full:
            with self._lock:
                self.dropped += 1
            return False
        with self._lock:
            self.enqueued += 1
        return True

    def get(self, timeout: float | None = None):
        try:
            return self._q.get(timeout=timeout)
        except queue.Empty:
            return None

    def qsize(self) -> int:
        return self._q.qsize()
