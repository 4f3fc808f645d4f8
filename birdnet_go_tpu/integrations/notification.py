"""Notification service: templated webhooks with rate limiting + circuit
breakers (reference: internal/notification — shoutrrr providers, webhooks,
scripts; circuit breaker, rate limiting, burst tracking).

Providers here are generic JSON/text webhooks (covers ntfy, Gotify,
Discord/Slack-compatible endpoints via templates) plus a command runner.
"""

from __future__ import annotations

import dataclasses
import logging
import string
import subprocess
import threading
import time
from typing import Any

from birdnet_go_tpu.utils.circuit import CircuitBreaker, CircuitOpenError

log = logging.getLogger("birdnet_tpu.notification")


@dataclasses.dataclass
class NotificationTarget:
    name: str
    kind: str                          # "webhook" | "ntfy" | "command"
    url: str = ""
    method: str = "POST"
    headers: dict[str, str] = dataclasses.field(default_factory=dict)
    # $-templates over the event payload keys, e.g.
    # '{"text": "Detected $common_name ($confidence)"}'
    body_template: str = ""
    command: list[str] = dataclasses.field(default_factory=list)
    min_interval_seconds: float = 0.0   # per-target rate limit


@dataclasses.dataclass
class Notification:
    title: str
    message: str
    priority: str = "normal"           # low|normal|high|critical
    payload: dict[str, Any] = dataclasses.field(default_factory=dict)


class NotificationService:
    def __init__(self, targets: list[NotificationTarget] | None = None,
                 session=None, burst_limit: int = 20,
                 burst_window_seconds: float = 60.0):
        import httpx

        self.targets = targets or []
        self.session = session or httpx.Client(timeout=15.0)
        self._breakers = {t.name: CircuitBreaker() for t in self.targets}
        self._last_sent: dict[str, float] = {}
        self._burst: list[float] = []
        self.burst_limit = burst_limit
        self.burst_window = burst_window_seconds
        self._lock = threading.Lock()
        self.sent = 0
        self.suppressed = 0
        self.failed = 0

    def add_target(self, target: NotificationTarget) -> None:
        self.targets.append(target)
        self._breakers[target.name] = CircuitBreaker()

    def notify(self, n: Notification) -> int:
        """Dispatch to every eligible target; returns delivery count."""
        now = time.monotonic()
        with self._lock:
            # burst/DoS protection: global cap per window
            self._burst = [t for t in self._burst
                           if now - t < self.burst_window]
            if len(self._burst) >= self.burst_limit:
                self.suppressed += 1
                return 0
            self._burst.append(now)
        delivered = 0
        for t in self.targets:
            if t.min_interval_seconds > 0:
                with self._lock:
                    last = self._last_sent.get(t.name)
                    if last is not None and now - last < t.min_interval_seconds:
                        self.suppressed += 1
                        continue
                    self._last_sent[t.name] = now
            if self._send_one(t, n):
                delivered += 1
        return delivered

    def _send_one(self, t: NotificationTarget, n: Notification) -> bool:
        breaker = self._breakers.setdefault(t.name, CircuitBreaker())
        vars_ = {"title": n.title, "message": n.message,
                 "priority": n.priority,
                 **{k: str(v) for k, v in n.payload.items()}}
        try:
            if t.kind == "command":
                cmd = [string.Template(c).safe_substitute(vars_)
                       for c in t.command]
                breaker.call(subprocess.run, cmd, check=True, timeout=30,
                             capture_output=True)
            elif t.kind == "ntfy":
                breaker.call(self._post, t.url, n.message.encode(),
                             {"Title": n.title, "Priority": n.priority,
                              **t.headers})
            else:                                   # generic webhook
                body = string.Template(
                    t.body_template or '{"title": "$title", '
                    '"message": "$message"}').safe_substitute(vars_)
                breaker.call(self._post, t.url, body.encode(),
                             {"Content-Type": "application/json",
                              **t.headers}, t.method)
            self.sent += 1
            return True
        except CircuitOpenError:
            self.suppressed += 1
            return False
        except Exception as e:  # noqa: BLE001
            self.failed += 1
            log.warning("notification to %s failed: %s", t.name, e)
            return False

    def _post(self, url: str, content: bytes, headers: dict,
              method: str = "POST") -> None:
        r = self.session.request(method, url, content=content,
                                 headers=headers)
        r.raise_for_status()
