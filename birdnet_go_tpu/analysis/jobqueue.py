"""Bounded async job queue with per-action retry policies.

Reference: internal/analysis/jobqueue/ — capacity 1000, job lifecycle
pending → running → completed/failed, per-action RetryConfig with
exponential backoff, stats counters. Drops (queue full) are the designed
overload behavior and are counted, never blocking the producer.
"""

from __future__ import annotations

import dataclasses
import enum
import logging
import queue
import threading
import time
from typing import Any, Callable

log = logging.getLogger("birdnet_tpu.jobqueue")

DEFAULT_CAPACITY = 1000               # jobqueue/queue.go:59


class JobStatus(str, enum.Enum):
    PENDING = "pending"
    RUNNING = "running"
    COMPLETED = "completed"
    FAILED = "failed"


@dataclasses.dataclass(frozen=True)
class RetryConfig:
    enabled: bool = False
    max_retries: int = 3
    initial_delay: float = 5.0
    backoff_multiplier: float = 2.0
    max_delay: float = 300.0

    def delay_for(self, attempt: int) -> float:
        return min(self.initial_delay * self.backoff_multiplier ** attempt,
                   self.max_delay)


@dataclasses.dataclass
class Job:
    action: Callable[[], Any]
    description: str
    retry: RetryConfig = dataclasses.field(default_factory=RetryConfig)
    status: JobStatus = JobStatus.PENDING
    attempts: int = 0
    enqueued_at: float = dataclasses.field(default_factory=time.monotonic)
    not_before: float = 0.0
    last_error: str | None = None


@dataclasses.dataclass
class JobQueueStats:
    enqueued: int = 0
    completed: int = 0
    failed: int = 0
    retried: int = 0
    dropped: int = 0


class JobQueue:
    """Bounded worker-pool job queue (non-blocking enqueue, drop-counted)."""

    def __init__(self, capacity: int = DEFAULT_CAPACITY, workers: int = 4):
        self.capacity = capacity
        self._queue: queue.Queue[Job | None] = queue.Queue(maxsize=capacity)
        self._workers = workers
        self._threads: list[threading.Thread] = []
        self._retry_timer_lock = threading.Lock()
        self._stop = threading.Event()
        self.stats = JobQueueStats()
        self._stats_lock = threading.Lock()

    def start(self) -> None:
        if self._threads:
            return
        self._stop.clear()
        for i in range(self._workers):
            t = threading.Thread(target=self._worker, name=f"jobq-{i}",
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self, drain: bool = True, timeout: float = 10.0) -> None:
        if drain:
            deadline = time.monotonic() + timeout
            while not self._queue.empty() and time.monotonic() < deadline:
                time.sleep(0.01)
        self._stop.set()
        for _ in self._threads:
            try:
                self._queue.put_nowait(None)
            except queue.Full:
                break
        for t in self._threads:
            t.join(timeout=2)
        self._threads.clear()

    def enqueue(self, action: Callable[[], Any], description: str,
                retry: RetryConfig | None = None) -> bool:
        """Non-blocking; returns False (and counts a drop) when full."""
        job = Job(action=action, description=description,
                  retry=retry or RetryConfig())
        try:
            self._queue.put_nowait(job)
        except queue.Full:
            with self._stats_lock:
                self.stats.dropped += 1
            log.warning("job queue full, dropped: %s", description)
            return False
        with self._stats_lock:
            self.stats.enqueued += 1
        return True

    def pending(self) -> int:
        return self._queue.qsize()

    def _worker(self) -> None:
        while not self._stop.is_set():
            job = self._queue.get()
            if job is None:
                return
            if job.not_before > time.monotonic():
                # not yet due: requeue and yield (cheap timer-less retry)
                try:
                    self._queue.put_nowait(job)
                except queue.Full:
                    with self._stats_lock:
                        self.stats.dropped += 1
                time.sleep(0.02)
                continue
            self._execute(job)

    def _execute(self, job: Job) -> None:
        job.status = JobStatus.RUNNING
        job.attempts += 1
        try:
            job.action()
        except Exception as e:  # noqa: BLE001 — actions are arbitrary
            job.last_error = f"{type(e).__name__}: {e}"
            if job.retry.enabled and job.attempts <= job.retry.max_retries:
                delay = job.retry.delay_for(job.attempts - 1)
                job.not_before = time.monotonic() + delay
                job.status = JobStatus.PENDING
                with self._stats_lock:
                    self.stats.retried += 1
                log.info("job %r failed (%s), retry %d/%d in %.1fs",
                         job.description, job.last_error, job.attempts,
                         job.retry.max_retries, delay)
                try:
                    self._queue.put_nowait(job)
                except queue.Full:
                    with self._stats_lock:
                        self.stats.dropped += 1
                return
            job.status = JobStatus.FAILED
            with self._stats_lock:
                self.stats.failed += 1
            log.error("job %r failed permanently: %s", job.description,
                      job.last_error)
            return
        job.status = JobStatus.COMPLETED
        with self._stats_lock:
            self.stats.completed += 1
